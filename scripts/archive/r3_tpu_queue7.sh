#!/bin/bash
# Round-3 queue 7: hardware follow-ups serialized behind queue 6.
#   nohup bash scripts/r3_tpu_queue7.sh > /tmp/r3_queue7.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while pgrep -f "bash scripts/r3_tpu_queue6.sh" > /dev/null; do sleep 180; done
echo "=== queue 6 done ($(date +%H:%M:%S)) ==="

# probe the tunnel before committing to stages
while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe7.log 2>&1; do
  sleep 180
done
echo "=== tunnel up ($(date +%H:%M:%S)) ==="

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== stage $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  tail -8 "/tmp/r3_${name}.log"
  if [ $rc -eq 124 ]; then
    echo "=== stage $name TIMED OUT — tunnel presumed wedged, stopping ==="
    exit 1
  fi
  return $rc
}

# 1. 4k-prompt TTFT through the mixed engine (VERDICT r2 #5 engine clause)
stage ttft4k 3600 python scripts/measure_ttft_4k.py --layers 16

# 2. MoE stack row, dispatch-free burst (now fused experts)
stage moe_burst 2400 python -m atom_tpu.benchmarks.bench_textgen \
  --layers 8 --batch 32 --stacks moe

echo "=== r3 queue 7 complete ($(date +%H:%M:%S)) ==="
