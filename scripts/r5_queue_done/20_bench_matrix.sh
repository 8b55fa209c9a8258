# TIMEOUT=7200
# 2x2 attribution matrix for the round-4 regression (VERDICT r4 #1):
# fused-MLP {on,off} x reduce_precision XLA pins {on,off}.
# ec71713 claims -1.88 ms/step from the fused MLP; BENCH_r04 moved +0.2 —
# this locates the missing ~2 ms (prime suspect: the pins on every layer).
cd /root/repo
set -x
python bench.py 2>&1 | sed 's/^/[fused+rp] /'
ATOM_TPU_NO_FUSED_MLP=1 python bench.py 2>&1 | sed 's/^/[nofused+rp] /'
ATOM_TPU_NO_RP=1 python bench.py 2>&1 | sed 's/^/[fused+norp] /'
ATOM_TPU_NO_RP=1 ATOM_TPU_NO_FUSED_MLP=1 python bench.py 2>&1 | sed 's/^/[nofused+norp] /'
