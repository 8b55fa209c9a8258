# TIMEOUT=5400
# Decode-attention kernel A/Bs (155 us quiet vs 92 us DMA floor): unpack /
# dot variants from ab_decode_v3 + v4 at bench shapes.
cd /root/repo
set -x
python scripts/ab_decode_v3.py 2>&1 | tail -40
python scripts/ab_decode_v4.py 2>&1 | tail -40
