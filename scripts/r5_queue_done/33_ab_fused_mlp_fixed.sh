# TIMEOUT=5400
# Re-run ab_fused_mlp with the PINNED rstd oracle (the qkv parity failure
# in stage 32 was the r3 oracle-bug class, not a kernel divergence) and the
# 0.999 bounds restored (ADVICE r4 #5).
cd /root/repo
python scripts/ab_fused_mlp.py 2>&1 | tail -30
