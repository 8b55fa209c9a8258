# TIMEOUT=5400
# Standing hardware preflight (VERDICT r4 #3): every serving path compiles
# and runs one step on the real chip, incl. the ctx-2048 prefill repro of
# the r3 longctx failure.
cd /root/repo
python scripts/hw_smoke.py
