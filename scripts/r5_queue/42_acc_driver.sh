# TIMEOUT=21600
# Single-process accuracy driver (replaces stages 60-63): fp16 cross-check,
# corpus-cloze zero-shot, Mixtral INT-vs-FP4, full FP4 ladder — one client
# connection to minimize tunnel-wedge risk.
export JAX_DEFAULT_MATMUL_PRECISION=highest
cd /root/repo
python scripts/r5_acc_driver.py
