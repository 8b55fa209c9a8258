#!/bin/bash
# Round-3 phase-2 TPU queue: waits for r3_tpu_queue.sh to finish, then runs
# the decode-step phase decomposition + the re-runs fixed since queue 1
# (pre-padded w4a16/lm_head weights, bench_op pytree outputs).
#   nohup bash scripts/r3_tpu_queue2.sh > /tmp/r3_queue2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait for queue 1 (any live r3_tpu_queue.sh bash)
while pgrep -f "bash scripts/r3_tpu_queue.sh" > /dev/null; do sleep 60; done
echo "=== queue 1 done ($(date +%H:%M:%S)) ==="

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== stage $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  tail -5 "/tmp/r3_${name}.log"
  if [ $rc -eq 124 ]; then
    echo "=== stage $name TIMED OUT — tunnel presumed wedged, stopping queue ==="
    exit 1
  fi
  return 0
}

# 1. decode-step phase decomposition (the headline/2x diagnostic)
stage phases 2400 python scripts/ab_step_phases.py

# 2. headline re-run (lm_head now pre-padded at init — in-loop 132 MB pad gone)
stage bench2 2400 python bench.py

# 3. w4a16 stack (pre-padded MLP weights fix the OOM)
stage stacks2 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w4a16

# 4. bf16 fixed-memory point, smaller: bs2/ctx256; 13.5 GB weights + tiny KV
stage bf16b 2400 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 2 --ctx 256 --stacks bf16

# 5. ring-fold timing (bench_op pytree fix)
stage ringfold2 1800 python scripts/ab_ring_fold.py

# 6. decode-kernel micro-variants (u8 unpack / fused dot)
stage dkv3 2400 python scripts/ab_decode_v3.py

echo "=== r3 phase-2 queue complete ($(date +%H:%M:%S)) ==="
