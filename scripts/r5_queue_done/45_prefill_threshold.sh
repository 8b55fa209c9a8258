# TIMEOUT=7200
# Long-context prefill timings + PREFILL_KERNEL_THRESHOLD decision
# (VERDICT r4 #5 second half; runs only if 10_smoke shows longctx passes —
# otherwise the log carries the fresh traceback for the fix).
cd /root/repo
python scripts/measure_prefill_longctx.py --layers 4 --ctx 2048 4096
