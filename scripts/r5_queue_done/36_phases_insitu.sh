# TIMEOUT=7200
# Phase decomposition WITH the in-situ marginal-layer measurement
# (decode_hidden 2L - 1L), fused vs unfused — the decisive number for why
# the isolated fused-MLP win (+45.5 us/layer) does not compose into the
# step (matrix: fused is +0.3 ms/step SLOWER).
cd /root/repo
set -x
python scripts/ab_step_phases.py 2>&1 | tail -25
ATOM_TPU_NO_FUSED_MLP=1 python scripts/ab_step_phases.py 2>&1 | tail -25
