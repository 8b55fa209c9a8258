#!/bin/bash
# Round-3 TPU measurement queue — run ONCE in background when the TPU is up:
#   nohup bash scripts/r3_tpu_queue.sh > /tmp/r3_queue.log 2>&1 &
# Each stage logs to /tmp/r3_<stage>.log; generous per-stage timeouts (a
# stage that exceeds them means the tunnel wedged — later stages would hang
# too, so we stop the queue there).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

stage() {  # stage <name> <timeout_s> <cmd...>
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

# 1. ring-fold hardware parity + per-layer timing
stage ringfold 1800 python scripts/ab_ring_fold.py

# 2. headline bench with the ring fold
stage bench 2400 python bench.py

# 3. full-geometry stack table: w8a8 (int8 KV) + w4a16
stage stacks 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w8a8 w4a16

# 4. bf16 fixed-memory point (weights 13.5 GB leave room for only tiny KV:
#    batch 4 — the reference's own fixed-memory argument, README.md:120-122)
stage bf16 2400 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 4 --ctx 512 --stacks bf16

# 5. dispatch-free MoE burst (8-layer Mixtral slice)
stage moe 2400 python -m atom_tpu.benchmarks.bench_textgen \
  --layers 8 --batch 32 --stacks moe

# 6. train the BYTE_LM accuracy fixture on the corpus
stage train 3600 python scripts/train_corpus_model.py \
  --steps 2400 --out data/byte_lm_ckpt.npz

# 7+8. real-text ablation ladders (INT then FP4) on the trained model
stage ablation_int 7200 env DATASET=corpus CKPT=data/byte_lm_ckpt.npz \
  SEQLEN=2048 bash scripts/run_atom_ablation.sh byte-lm
stage ablation_fp4 7200 env DATASET=corpus CKPT=data/byte_lm_ckpt.npz \
  SEQLEN=2048 QTYPE=fp bash scripts/run_atom_ablation.sh byte-lm

# 9. real-text zero-shot (cloze) on the trained model: fp16 vs W4A4
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

echo "=== r3 TPU queue complete ($(date +%H:%M:%S)) ==="
