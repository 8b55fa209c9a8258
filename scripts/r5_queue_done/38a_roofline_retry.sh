# TIMEOUT=5400
# Retry of the GEMM roofline ladder after fixing the v1 probe's i8 vector
# add (Mosaic only supports i16/i32 vector arith on this toolchain).
cd /root/repo
python scripts/ab_kernel_roofline.py
