# TIMEOUT=10800
# Single-process accuracy driver (replaces stages 60-63): fp16 cross-check,
# corpus-cloze zero-shot, Mixtral INT-vs-FP4, full FP4 ladder — one client
# connection to minimize tunnel-wedge risk.
export JAX_DEFAULT_MATMUL_PRECISION=highest
cd /root/repo
( while true; do sleep 300; echo "hb $(date +%H:%M:%S)"; done ) &
HB=$!
trap "kill $HB 2>/dev/null" EXIT
python scripts/r5_acc_driver.py
