"""Calibration / evaluation data loaders (wikitext2, ptb, c4 + synthetic).

Functional analog of ``model/datautils.py``: seeded random ``seqlen``-token
calibration samples from the training split, plus the full tokenized test
stream for PPL.  The HF datasets/tokenizer path is gated — this environment has
no network egress — and a deterministic synthetic stream stands in for tests
and benchmarks (seeded Zipf-ish token draws so PPL is reproducible).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

_HF_SPECS = {
    "wikitext2": ("wikitext", "wikitext-2-raw-v1", "text", "\n\n"),
    "ptb": ("ptb_text_only", "penn_treebank", "sentence", " "),
    "c4": ("allenai/c4", "en", "text", " "),
}


def synthetic_tokens(
    vocab_size: int, n_tokens: int, seed: int = 0, alpha: float = 1.2
) -> np.ndarray:
    """Deterministic Zipf-distributed token stream (a stand-in corpus).

    Heavy-tailed like natural text so PPL comparisons between quantization
    settings remain meaningful without network access.
    """
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks**-alpha
    probs /= probs.sum()
    return rng.choice(vocab_size, size=n_tokens, p=probs).astype(np.int32)


def synthetic_loaders(
    vocab_size: int,
    nsamples: int = 8,
    seqlen: int = 256,
    seed: int = 0,
    test_tokens: int = 4096,
) -> Tuple[List[np.ndarray], np.ndarray]:
    """(calibration batches [1, seqlen], flat test stream) from the synthetic corpus."""
    stream = synthetic_tokens(vocab_size, nsamples * seqlen + test_tokens, seed)
    batches = [
        stream[i * seqlen : (i + 1) * seqlen][None].astype(np.int32)
        for i in range(nsamples)
    ]
    return batches, stream[nsamples * seqlen :]


def get_loaders(
    name: str,
    tokenizer,
    nsamples: int = 128,
    seed: int = 0,
    seqlen: int = 2048,
) -> Tuple[List[np.ndarray], np.ndarray]:
    """HF-dataset loaders, mirroring ``get_loaders`` (datautils.py:148-179).

    Calibration: ``nsamples`` random ``seqlen`` windows from the train split
    (seeded).  Test: the flat tokenized test stream.  Requires network / a local
    HF cache; raises a clear error otherwise.
    """
    if name not in _HF_SPECS:
        raise ValueError(f"unknown dataset {name!r}; options: {list(_HF_SPECS)}")
    try:
        from datasets import load_dataset

        ds_name, ds_config, field, joiner = _HF_SPECS[name]
        train = load_dataset(ds_name, ds_config, split="train")
        test_split = "validation" if name == "c4" else "test"
        test = load_dataset(ds_name, ds_config, split=test_split)
    except Exception as e:  # pragma: no cover - network-gated
        raise RuntimeError(
            f"could not load dataset {name!r} (no network / cache?): {e}. "
            "Use synthetic_loaders() for offline runs."
        ) from e

    ds_name, ds_config, field, joiner = _HF_SPECS[name]
    train_ids = tokenizer(joiner.join(train[field]), return_tensors="np")[
        "input_ids"
    ][0]
    test_ids = tokenizer(joiner.join(test[field]), return_tensors="np")[
        "input_ids"
    ][0]

    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(nsamples):
        start = int(rng.integers(0, len(train_ids) - seqlen - 1))
        batches.append(train_ids[start : start + seqlen][None].astype(np.int32))
    return batches, test_ids.astype(np.int32)


def corpus_loaders(
    nsamples: int = 16,
    seqlen: int = 2048,
    seed: int = 0,
    corpus_dir: str = "data/corpus",
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Loaders over the vendored real-text corpus (byte-level).

    The wikitext2-analog for this egress-free environment: real English prose
    (data/corpus/PROVENANCE.md) tokenized as raw UTF-8 bytes
    (``utils/bytetok.py``).  Calibration samples are seeded random ``seqlen``
    windows of train.txt; the test stream is all of eval.txt — mirroring
    ``get_loaders`` (datautils.py:148-179).
    """
    import os

    from atom_tpu.utils import bytetok

    train = bytetok.encode_file(os.path.join(corpus_dir, "train.txt"))
    test = bytetok.encode_file(os.path.join(corpus_dir, "eval.txt"))
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(nsamples):
        start = int(rng.integers(0, len(train) - seqlen - 1))
        batches.append(train[start : start + seqlen][None].astype(np.int32))
    return batches, test.astype(np.int32)
