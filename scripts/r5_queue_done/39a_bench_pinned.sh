# TIMEOUT=7200
# Headline bench with the context-pinned protocol (lens reset to ctx=512
# before every slope sample; r02-r04 drifted to 1024 across the series,
# overstating the ctx-512 step time by ~1.5 ms at 32L), fused default vs
# fused off — re-decides the fused default under the corrected protocol.
cd /root/repo
set -x
python bench.py
ATOM_TPU_NO_FUSED_MLP=1 python bench.py
