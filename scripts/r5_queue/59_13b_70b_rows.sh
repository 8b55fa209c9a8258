# TIMEOUT=10800
# 13B full-geometry and 70B-slice serving rows (VERDICT r4 #5 first half;
# north-star config 3).  13B: hidden 5120, 40 heads, inter 13824 — full 40
# layers at bs32 fits the 4-bit weight budget (~6.5 GB).  70B: GQA slice
# (hidden 8192, 64 q / 8 kv heads, inter 28672) at 8 layers.
# Self-heartbeat: the current toolchain compiles ~10x slower (32L 7B burst
# = 2558 s); these compiles are silent LONGER than the runner's 25-min
# stall window, so keep the log growing from inside the stage.
cd /root/repo
( while true; do sleep 300; echo "hb $(date +%H:%M:%S)"; done ) &
HB=$!
trap "kill $HB 2>/dev/null" EXIT
set -x
python -m atom_tpu.benchmarks.bench_textgen --model 13b --layers 40 --batch 32 --ctx 512 --stacks w4a4
python -m atom_tpu.benchmarks.bench_textgen --model 70b --layers 8 --batch 32 --ctx 512 --stacks w4a4
