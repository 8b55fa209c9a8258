"""Self-contained byte-level tokenizer (vocab 256).

The reference tokenizes eval corpora with each model's HF tokenizer
(`model/datautils.py:11-28`); no pretrained tokenizer can be downloaded here,
so the real-text accuracy artifact uses raw UTF-8 bytes — zero vocabulary
assets, fully reproducible, and byte-level LMs develop the same
activation-outlier structure the quantization ladder exercises.
"""
from __future__ import annotations

import numpy as np

VOCAB_SIZE = 256


def encode(text: str | bytes) -> np.ndarray:
    if isinstance(text, str):
        text = text.encode("utf-8", errors="ignore")
    return np.frombuffer(text, dtype=np.uint8).astype(np.int32)


def decode(ids) -> str:
    return bytes(np.asarray(ids, dtype=np.uint8)).decode(
        "utf-8", errors="ignore"
    )


def encode_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.frombuffer(f.read(), dtype=np.uint8).astype(np.int32)
