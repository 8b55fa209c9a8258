# TIMEOUT=3600
# Phase decomposition at HEAD (VERDICT r4 weak #4: ab_step_phases died in
# packed_w4_gemm_qkv_ring's Mosaic reshape on the new toolchain — check
# whether ec71713's plumbing fixed it; full traceback lands in the log).
cd /root/repo
python scripts/ab_step_phases.py
