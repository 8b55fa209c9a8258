#!/bin/bash
# Round-3 queue 5: hardware-only stages (accuracy moved to CPU,
# scripts/r3_cpu_accuracy.sh).  Waits for the tunnel, then validates the
# merged paged+ring kernel on hardware, re-takes the headline / phase /
# stack numbers with it, A/Bs the v4 kernel variants, and measures
# long-context prefill.
#   nohup bash scripts/r3_tpu_queue5.sh > /tmp/r3_queue5.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait for the tunnel (probe compiles + fetches a scalar)
while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe.log 2>&1; do
  sleep 180
done
echo "=== tunnel up at $(date +%H:%M:%S) ==="

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== stage $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  tail -6 "/tmp/r3_${name}.log"
  if [ $rc -eq 124 ]; then
    echo "=== stage $name TIMED OUT — tunnel presumed wedged, stopping ==="
    exit 1
  fi
  return 0
}

# 1. merged-kernel hardware parity + per-layer timing
stage ringhw 2400 python scripts/ab_ring_kernel_hw.py

# 2. in-GEMM ring store parity + timing (page layout)
stage ringfold2 2400 python scripts/ab_ring_fold.py

# 3. headline with the merged kernel
stage bench3 2400 python bench.py

# 4. phase decomposition (incl. merged-kernel row)
stage phases2 2400 python scripts/ab_step_phases.py

# 5. decode-kernel v4 A/B (block-diagonal page dots, page pairs)
stage dkv4_512 2400 python scripts/ab_decode_v4.py --ctx 512
stage dkv4_1024 2400 python scripts/ab_decode_v4.py --ctx 1024

# 6. the north-star ratio at full geometry with the merged kernel
stage stacks_ratio 4800 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w4a4 w8a8

# 7. w4a16 stack (pre-padded weights; OOM fixed)
stage stacks_w4a16 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w4a16

# 8. bf16 fixed-memory point, bs2/ctx256
stage bf16b 2400 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 2 --ctx 256 --stacks bf16

# 9. long-context prefill: one-pass vs scanned at 2k/4k/8k
stage longctx 3600 python scripts/measure_prefill_longctx.py \
  --layers 4 --ctx 2048 4096 8192

echo "=== r3 queue 5 complete ($(date +%H:%M:%S)) ==="
