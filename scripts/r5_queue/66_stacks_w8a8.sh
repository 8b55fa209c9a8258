# TIMEOUT=10800
# Fresh w8a8 32L row on the current toolchain so the w4a4/w8a8 ratio is
# same-toolchain (w4a4 = 18.90 ms from stage 39a; the 20.39 ms w8a8
# standing is pre-reset).  Self-heartbeat for the long silent compile.
cd /root/repo
( while true; do sleep 300; echo "hb $(date +%H:%M:%S)"; done ) &
HB=$!
trap "kill $HB 2>/dev/null" EXIT
python -m atom_tpu.benchmarks.bench_textgen --layers 32 --batch 32 --ctx 512 --stacks w8a8
