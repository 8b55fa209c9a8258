#!/bin/bash
# Round-3 queue 10: 13B serving evidence (north-star config 3) + 70B-slice
# GQA decode row, behind queue 9.
# 13B full-model KV at bs32/burst-length doesn't fit 16 GB next to the 6.5 GB
# weights, so: (a) 20-layer slice at bs32 (the established slice protocol —
# runtime is layer-dominated, bench.py scales the same way), (b) full 40
# layers at bs16 (fits: ~5.5 GB KV + 6.5 GB weights).
#   nohup bash scripts/r3_tpu_queue10.sh > /tmp/r3_queue10.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while pgrep -f "bash scripts/r3_tpu_queue9.sh" > /dev/null; do sleep 240; done
echo "=== queue 9 done ($(date +%H:%M:%S)) ==="

while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe10.log 2>&1; do
  sleep 180
done
echo "=== tunnel up ($(date +%H:%M:%S)) ==="

timeout 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 13b --layers 20 --batch 32 --stacks w4a4 w8a8 \
  > /tmp/r3_13b_slice.log 2>&1
tail -8 /tmp/r3_13b_slice.log

timeout 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 13b --layers 40 --batch 16 --stacks w4a4 \
  > /tmp/r3_13b_full.log 2>&1
tail -8 /tmp/r3_13b_full.log

timeout 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 70b --layers 8 --batch 32 --stacks w4a4 \
  > /tmp/r3_70b_slice.log 2>&1
tail -8 /tmp/r3_70b_slice.log

echo "=== r3 queue 10 complete ($(date +%H:%M:%S)) ==="
