#!/bin/bash
# Round-3 queue 9: LoRA serving cost on hardware, behind the supervisor.
# 16-layer slice so the rank-16 distinct-adapter store (~2.5 GB) + weights
# fit comfortably; the lora/w4a4 ratio is the metric (both rows same slice).
#   nohup bash scripts/r3_tpu_queue9.sh > /tmp/r3_queue9.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while pgrep -f "bash scripts/r3_tpu_supervisor.sh" > /dev/null; do sleep 240; done
echo "=== supervisor done ($(date +%H:%M:%S)) ==="

while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe9.log 2>&1; do
  sleep 180
done
echo "=== tunnel up ($(date +%H:%M:%S)) ==="

timeout 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 16 --batch 32 --stacks w4a4 lora \
  > /tmp/r3_lora_burst.log 2>&1
tail -8 /tmp/r3_lora_burst.log

echo "=== r3 queue 9 complete ($(date +%H:%M:%S)) ==="
