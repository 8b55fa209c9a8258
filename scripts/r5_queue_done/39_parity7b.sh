# TIMEOUT=3600
# Production-width fused parity decision (see hw_smoke.parity_7b docstring).
cd /root/repo
python scripts/hw_smoke.py --paths parity_7b
