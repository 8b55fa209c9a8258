# TIMEOUT=14400
# Full-depth byte-LM export -> engine generation -> served-PPL parity
# (the calibrate->serve bridge quality artifact, queued since round 3).
export JAX_DEFAULT_MATMUL_PRECISION=highest
cd /root/repo
python scripts/serve_byte_lm.py
