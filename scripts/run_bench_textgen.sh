#!/bin/bash
# Serving throughput comparison (the analog of e2e bench_textgen_all):
# W4A4 vs bf16 vs W8A8 decode rates + the full engine run.
set -e
python -m atom_tpu.benchmarks.bench_textgen --model 7b --layers "${1:-32}" \
  --stacks w4a4 ${2:+$2}
