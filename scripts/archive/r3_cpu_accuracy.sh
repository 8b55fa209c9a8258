#!/bin/bash
# Round-3 accuracy stages on CPU (the fake-quant pipeline is pure jnp —
# device-independent; the 14:19 tunnel wedge does not gate these).
#   nohup bash scripts/r3_cpu_accuracy.sh > /tmp/r3_cpu_acc.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

# 1. remaining INT ablation rungs (keyed CSV; skips ones already present)
timeout 21600 bash scripts/r3_ablation_retry.sh > /tmp/r3_ablation_cpu.log 2>&1
tail -8 /tmp/r3_ablation_cpu.log

# 2. FP4 ablation ladder (BASELINE.md:30 FP4 rows analog)
timeout 21600 env DATASET=corpus CKPT=data/byte_lm_ckpt.npz SEQLEN=2048 \
  QTYPE=fp bash scripts/run_atom_ablation.sh byte-lm \
  > /tmp/r3_ablation_fp4.log 2>&1
tail -12 /tmp/r3_ablation_fp4.log

# 3. real-text zero-shot cloze: fp16 vs W4A4
timeout 7200 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --zs_limit 64 --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache \
  --calib_samples 2 > /tmp/r3_cloze_fp16.log 2>&1
tail -4 /tmp/r3_cloze_fp16.log
timeout 14400 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --zs_limit 64 --reorder --use_gptq --kv_cache --calib_samples 16 \
  > /tmp/r3_cloze_w4a4.log 2>&1
tail -4 /tmp/r3_cloze_w4a4.log

echo "=== r3 CPU accuracy complete ($(date +%H:%M:%S)) ==="
