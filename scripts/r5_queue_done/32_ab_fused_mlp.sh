# TIMEOUT=5400
# Per-kernel fused-vs-unfused timing + parity at 7B geometry (splits the
# step-level +0.3 ms regression between the fused o_proj and fused MLP).
cd /root/repo
python scripts/ab_fused_mlp.py 2>&1 | tail -60
