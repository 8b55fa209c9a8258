# TIMEOUT=7200
# Retry: fused-default bench under the pinned-ctx protocol (the 39a run
# died in a tunnel hiccup during param init).
cd /root/repo
python bench.py
