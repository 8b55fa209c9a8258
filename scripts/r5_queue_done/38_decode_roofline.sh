# TIMEOUT=5400
# Decode-attention roofline ladder (L0 stream -> full) + V-dot experiments
# (bf16 V dots, head-batched dots) at bench shapes.
cd /root/repo
python scripts/ab_decode_roofline.py
