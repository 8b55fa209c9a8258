# TIMEOUT=5400
# GEMM roofline ladder: DMA / unpack / dots / scale-FMA decomposition of
# the 2-4x-above-floor decode kernels (phases: gateup 104 vs 56 floor etc).
cd /root/repo
python scripts/ab_kernel_roofline.py
