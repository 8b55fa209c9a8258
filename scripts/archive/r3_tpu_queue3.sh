#!/bin/bash
# Round-3 queue 3: runs when the TPU tunnel recovers.  Validates the
# page-layout ring + merged decode kernel on hardware, re-takes the headline
# and stack numbers, then finishes the accuracy / long-context stages that
# the 14:19 tunnel wedge killed.
#   nohup bash scripts/r3_tpu_queue3.sh > /tmp/r3_queue3.log 2>&1 &
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

# 5. w4a16 stack (pre-padded weights; OOM fixed)
stage stacks_w4a16 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w4a16

# 6. bf16 fixed-memory point, bs2/ctx256
stage bf16b 2400 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 2 --ctx 256 --stacks bf16

# 7. remaining INT ablation rungs (keyed CSV; skips ones already present)
stage ablation_int2 14400 bash scripts/r3_ablation_retry.sh

# 8. FP4 ablation ladder
stage ablation_fp4 14400 env DATASET=corpus CKPT=data/byte_lm_ckpt.npz \
  SEQLEN=2048 QTYPE=fp bash scripts/run_atom_ablation.sh byte-lm

# 9. real-text zero-shot cloze: fp16 vs W4A4
stage cloze_fp16 1800 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --zs_limit 64 --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache \
  --calib_samples 2
stage cloze_w4a4 3600 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --zs_limit 64 --reorder --use_gptq --kv_cache --calib_samples 16

# 10. long-context prefill: one-pass vs scanned at 2k/4k/8k
stage longctx 3600 python scripts/measure_prefill_longctx.py \
  --layers 4 --ctx 2048 4096 8192

echo "=== r3 queue 3 complete ($(date +%H:%M:%S)) ==="
