#!/usr/bin/env python
"""Build the vendored real-text corpus from installed package documentation.

The reference evaluates PPL on wikitext2/ptb/c4 (`model/datautils.py:148`);
this environment has no network egress, so we vendor a real-English corpus
extracted from the *documentation prose* (module/class/function docstrings)
of a pinned list of permissively-licensed open-source packages installed in
the image (BSD/Apache/MIT — see data/corpus/PROVENANCE.md).  This is genuine
human-written English with natural statistics — unlike the seeded Zipf
stand-in (`atom_tpu/calib/data.py:synthetic_tokens`) it has real long-range
structure, so a model trained on it develops the activation-outlier structure
that Atom's reorder/keeper machinery exists to handle.

Deterministic: fixed package list, sorted file walk, fixed shuffle seed.
Output: data/corpus/train.txt (~8 MB), data/corpus/eval.txt (~512 KB).

Usage: python scripts/make_corpus.py [--out data/corpus]
"""
from __future__ import annotations

import argparse
import ast
import hashlib
import os
import random
import re

# Pinned, permissively licensed packages (license noted in PROVENANCE.md).
PACKAGES = [
    "sympy", "scipy", "numpy", "sklearn", "pandas", "matplotlib",
    "IPython", "torch", "jax", "transformers", "networkx",
]

SITE = "/opt/venv/lib/python3.12/site-packages"

EVAL_BYTES = 512 * 1024
TRAIN_BYTES = 8 * 1024 * 1024


def _prose_like(par: str) -> bool:
    """Keep paragraphs that read as English prose, not code/tables."""
    if len(par) < 120:
        return False
    letters = sum(c.isalpha() or c == " " for c in par)
    if letters / len(par) < 0.72:
        return False
    # drop doctest / code-ish paragraphs
    if par.lstrip().startswith((">>>", "...", "def ", "class ", "import ")):
        return False
    if par.count(">>>") or par.count("´") or par.count("= ") > 8:
        return False
    # drop rst section headers / markup-heavy paragraphs
    if "---" in par or "===" in par or "::" in par:
        return False
    if par.count("`") > 6 or par.count(":") > 6 or par.count("|") > 2:
        return False
    # require sentence structure
    words = par.split()
    if len(words) < 15:
        return False
    return True


def _clean(doc: str) -> list[str]:
    # normalize whitespace per paragraph; split on blank lines
    pars = re.split(r"\n\s*\n", doc)
    out = []
    for p in pars:
        p = " ".join(p.split())
        if _prose_like(p):
            out.append(p)
    return out


def extract(packages=PACKAGES, site=SITE):
    seen = set()
    paragraphs = []
    for pkg in packages:
        root = os.path.join(site, pkg)
        if not os.path.isdir(root):
            print(f"warning: {pkg} not found, skipping")
            continue
        files = []
        for dp, dns, fns in os.walk(root):
            if "__pycache__" in dp or os.sep + "tests" in dp:
                continue
            for f in fns:
                if f.endswith(".py"):
                    files.append(os.path.join(dp, f))
        for fp in sorted(files):
            try:
                src = open(fp, encoding="utf-8", errors="ignore").read()
                tree = ast.parse(src)
            except (OSError, SyntaxError):
                continue
            for node in ast.walk(tree):
                if isinstance(node, (ast.Module, ast.ClassDef,
                                     ast.FunctionDef, ast.AsyncFunctionDef)):
                    d = ast.get_docstring(node)
                    if not d:
                        continue
                    for par in _clean(d):
                        h = hashlib.sha1(par.encode()).digest()[:12]
                        if h in seen:
                            continue
                        seen.add(h)
                        paragraphs.append(par)
    return paragraphs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/corpus")
    args = ap.parse_args()
    pars = extract()
    print(f"{len(pars)} unique prose paragraphs, "
          f"{sum(len(p) for p in pars)/1e6:.1f} MB")
    rng = random.Random(1234)
    rng.shuffle(pars)

    os.makedirs(args.out, exist_ok=True)
    text = "\n\n".join(pars).encode("utf-8", errors="ignore")
    ev, tr = text[:EVAL_BYTES], text[EVAL_BYTES : EVAL_BYTES + TRAIN_BYTES]
    with open(os.path.join(args.out, "eval.txt"), "wb") as f:
        f.write(ev)
    with open(os.path.join(args.out, "train.txt"), "wb") as f:
        f.write(tr)
    print(f"wrote {len(tr)/1e6:.1f} MB train, {len(ev)/1e3:.0f} KB eval "
          f"to {args.out}/")


if __name__ == "__main__":
    main()
