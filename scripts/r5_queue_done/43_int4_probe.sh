# TIMEOUT=3600
# Probe native jnp.int4 weight refs in Pallas (hardware unpack + full-depth
# dots) vs the manual nibble-plane unpack — a potential 2x on the decode
# GEMM family if Mosaic supports it on this toolchain.
cd /root/repo
python scripts/probe_int4_native.py
