# TIMEOUT=7200
# Decompose burst step: constant-lens non-flush steps vs production ring
# windows (flush-step cost + growth).  8 layers: the current toolchain
# compiles ~10x slower than pre-reset (32L burst = 2558 s), and the flush
# cost scales with layers — extrapolate x4.
cd /root/repo
python scripts/ab_flush_cost.py --layers 8
