"""Zero-shot multiple-choice evaluation (the lm-eval adapter analog).

The reference wraps its model in ``lm_eval.base.BaseLM`` (``model/LMClass.py``)
and scores piqa/arc/boolq/hellaswag/winogrande via per-continuation
log-likelihoods (``model/main.py:281-332``).  lm-eval is not vendored in this
environment, so the scoring core is implemented directly: every task above
reduces to *loglikelihood ranking* — pick the answer whose tokens have the
highest (length-normalized) log-probability given the context.

``evaluate_multiple_choice`` consumes a generic task iterator of
``(context_tokens, [choice_tokens...], gold_index)`` so real datasets plug in
through any tokenizer; ``synthetic_task`` provides a seeded stand-in for
tests and smoke runs (no network egress here).
"""
from __future__ import annotations

from typing import Callable, Iterable, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def continuation_logprob(
    logits: jnp.ndarray,  # [T, V] for the full (context ++ choice) sequence
    full_tokens: np.ndarray,
    ctx_len: int,
) -> float:
    """Sum of log P(choice tokens | prefix) — ``BaseLM._loglikelihood_tokens``
    semantics."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = len(full_tokens)
    # logits[i] predicts token i+1
    idx = jnp.arange(ctx_len - 1, t - 1)
    tgt = jnp.asarray(full_tokens[ctx_len:], jnp.int32)
    return float(jnp.sum(lp[idx, tgt]))


def evaluate_multiple_choice(
    forward: Callable[[jnp.ndarray], jnp.ndarray],  # ids [1, T] -> logits [1, T, V]
    examples: Iterable[Tuple[np.ndarray, Sequence[np.ndarray], int]],
    length_normalize: bool = True,
) -> dict:
    """Accuracy of loglikelihood-ranked answers.

    ``length_normalize`` divides by the choice token count (lm-eval's
    ``acc_norm`` uses byte length; token length is the tokenizer-free
    equivalent).  Returns {"acc": float, "n": int}.
    """
    correct = 0
    n = 0
    for ctx, choices, gold in examples:
        scores = []
        for ch in choices:
            full = np.concatenate([ctx, ch]).astype(np.int32)
            logits = forward(jnp.asarray(full[None]))[0]
            s = continuation_logprob(logits, full, len(ctx))
            if length_normalize:
                s /= max(len(ch), 1)
            scores.append(s)
        correct += int(np.argmax(scores) == gold)
        n += 1
    return {"acc": correct / max(n, 1), "n": n}


def synthetic_task(
    vocab_size: int,
    n_examples: int = 16,
    ctx_len: int = 24,
    choice_len: int = 6,
    n_choices: int = 4,
    seed: int = 0,
) -> List[Tuple[np.ndarray, List[np.ndarray], int]]:
    """Seeded synthetic MC task (the no-egress stand-in for piqa et al.)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    out = []
    for _ in range(n_examples):
        ctx = rng.integers(1, vocab_size, ctx_len).astype(np.int32)
        choices = [
            rng.integers(1, vocab_size, choice_len).astype(np.int32)
            for _ in range(n_choices)
        ]
        out.append((ctx, choices, int(rng.integers(0, n_choices))))
    return out


def hf_task_examples(
    task: str, tokenizer, limit: int = 0
) -> List[Tuple[np.ndarray, List[np.ndarray], int]]:
    """Real zero-shot tasks from locally cached HF datasets.

    Covers the reference's task list (``model/main.py:313``): piqa,
    arc_easy/arc_challenge, boolq, hellaswag, winogrande.  Requires the
    dataset to be present in the local HF cache (no egress here).
    """
    from datasets import load_dataset

    def tok(s):
        return np.asarray(tokenizer(s, add_special_tokens=False).input_ids, np.int32)

    out = []
    if task == "piqa":
        ds = load_dataset("piqa", split="validation")
        for ex in ds:
            out.append((
                tok(f"Question: {ex['goal']}\nAnswer:"),
                [tok(" " + ex["sol1"]), tok(" " + ex["sol2"])],
                int(ex["label"]),
            ))
    elif task in ("arc_easy", "arc_challenge"):
        name = "ARC-Easy" if task == "arc_easy" else "ARC-Challenge"
        ds = load_dataset("ai2_arc", name, split="validation")
        for ex in ds:
            labels = ex["choices"]["label"]
            if ex["answerKey"] not in labels:
                continue
            out.append((
                tok(f"Question: {ex['question']}\nAnswer:"),
                [tok(" " + t) for t in ex["choices"]["text"]],
                labels.index(ex["answerKey"]),
            ))
    elif task == "boolq":
        ds = load_dataset("boolq", split="validation")
        for ex in ds:
            out.append((
                tok(f"{ex['passage']}\nQuestion: {ex['question']}?\nAnswer:"),
                [tok(" no"), tok(" yes")],
                int(ex["answer"]),
            ))
    elif task == "hellaswag":
        ds = load_dataset("hellaswag", split="validation")
        for ex in ds:
            out.append((
                tok(ex["ctx"]),
                [tok(" " + e) for e in ex["endings"]],
                int(ex["label"]),
            ))
    elif task == "winogrande":
        ds = load_dataset("winogrande", "winogrande_xl", split="validation")
        for ex in ds:
            a, b = ex["sentence"].split("_")
            out.append((
                tok(a),
                [tok(ex["option1"] + b), tok(ex["option2"] + b)],
                int(ex["answer"]) - 1,
            ))
    else:
        raise ValueError(f"unknown task {task!r}")
    if limit:
        out = out[:limit]
    return out


def corpus_cloze_task(
    eval_tokens: np.ndarray,
    n_examples: int = 64,
    ctx_len: int = 192,
    choice_len: int = 64,
    n_choices: int = 4,
    seed: int = 0,
) -> List[Tuple[np.ndarray, List[np.ndarray], int]]:
    """REAL-text multiple choice over the vendored corpus (hellaswag-style).

    Each example: ``ctx_len`` bytes of held-out prose; the correct choice is
    its true continuation, distractors are continuations lifted from other
    positions.  A trained LM scores far above 1/n_choices by loglikelihood
    ranking (the same scoring core the reference uses via lm_eval,
    ``LMClass.py``); a random model stays at chance — so this is a REAL
    natural-language accuracy signal, not a Zipf stand-in.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    span = ctx_len + choice_len
    n_tok = len(eval_tokens)
    out = []
    for _ in range(n_examples):
        s = int(rng.integers(0, n_tok - span - 1))
        ctx = eval_tokens[s : s + ctx_len].astype(np.int32)
        true = eval_tokens[s + ctx_len : s + span].astype(np.int32)
        choices = []
        for _ in range(n_choices - 1):
            d = int(rng.integers(0, n_tok - choice_len - 1))
            choices.append(eval_tokens[d : d + choice_len].astype(np.int32))
        gold = int(rng.integers(0, n_choices))
        choices.insert(gold, true)
        out.append((ctx, choices, gold))
    return out
