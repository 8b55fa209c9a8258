# TIMEOUT=14400
# Full-depth byte-LM export -> engine generation -> served-PPL parity
# (the calibrate->serve bridge quality artifact, queued since round 3).
cd /root/repo
python scripts/serve_byte_lm.py
