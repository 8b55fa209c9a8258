#!/bin/bash
# Round-4 CPU accuracy queue (VERDICT r3 items 3+4): regenerate BOTH ablation
# ladders on the round-4 byte-LM checkpoint (the round-3 checkpoint was lost
# to the machine reset — its CSV rows are not reproducible, so the ladders
# are rebuilt whole rather than mixing rows from two different models),
# then the first real zero-shot number (corpus cloze, fp16 vs W4A4), the
# Mixtral INT-vs-FP4 delta, and the full-depth served-PPL parity artifact.
#
#   nohup bash scripts/r4_cpu_queue.sh > /tmp/r4_cpu_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

# 0. archive the round-3-checkpoint CSVs (provenance: STATUS.md round-3 rows)
for f in ablation_byte-lm.csv ablation_byte-lm_fp.csv; do
  [ -f "$f" ] && mv "$f" "${f%.csv}_r3ckpt.csv"
done

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== stage $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  tail -6 "/tmp/r4_${name}.log"
  echo "=== stage $name done rc=$rc ($(date +%H:%M:%S)) ==="
}

# 1. INT ablation ladder (8 rungs, fresh CSV)
stage ladder_int 43200 env DATASET=corpus CKPT=data/byte_lm_ckpt.npz \
  SEQLEN=2048 bash scripts/run_atom_ablation.sh byte-lm

# 2. FP4 ablation ladder
stage ladder_fp4 43200 env DATASET=corpus CKPT=data/byte_lm_ckpt.npz \
  SEQLEN=2048 QTYPE=fp bash scripts/run_atom_ablation.sh byte-lm

# 3. real zero-shot: corpus cloze, fp16 vs W4A4 (model/main.py:281-332 analog)
stage cloze_fp16 7200 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --wbits 16 --abits 16 --no-reorder --keeper 0 --calib_samples 2
stage cloze_w4a4 10800 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 \
  --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 \
  --w_clip_ratio 0.85 --use_gptq
{
  echo "task,config,acc"
  grep -h "^INFO corpus_cloze :" /tmp/r4_cloze_fp16.log | sed 's/^INFO /fp16,/' || true
  grep -h "^INFO corpus_cloze :" /tmp/r4_cloze_w4a4.log | sed 's/^INFO /w4a4,/' || true
} > zeroshot_byte-lm.csv
cat zeroshot_byte-lm.csv

# 4. Mixtral INT4-vs-FP4 delta (north-star config 5 accuracy half)
rm -f ablation_fp4-vs-int4.csv
COMMON=(tiny-mixtral synthetic --eval_ppl --seqlen 512 --calib_samples 2
        --wbits 4 --abits 4 --weight_group_size 128 --act_group_size 128
        --weight_channel_group 2 --reorder --keeper 128 --keeper_precision 3
        --a_clip_ratio 0.9 --w_clip_ratio 0.85 --kv_cache --use_gptq)
stage mixtral_int 10800 python -m atom_tpu.main "${COMMON[@]}" --quant_type int
grep "^targetResult," /tmp/r4_mixtral_int.log | sed 's/^/mixtral-int4,/' | tee -a ablation_fp4-vs-int4.csv
stage mixtral_fp4 10800 python -m atom_tpu.main "${COMMON[@]}" --quant_type fp
grep "^targetResult," /tmp/r4_mixtral_fp4.log | sed 's/^/mixtral-fp4,/' | tee -a ablation_fp4-vs-int4.csv
stage mixtral_fp16 7200 python -m atom_tpu.main tiny-mixtral synthetic --eval_ppl \
  --seqlen 512 --calib_samples 2 --wbits 16 --abits 16 --no-reorder \
  --keeper 0 --no-kv_cache
grep "^targetResult," /tmp/r4_mixtral_fp16.log | sed 's/^/mixtral-fp16,/' | tee -a ablation_fp4-vs-int4.csv

# 5. full-depth byte-LM export -> engine generation -> served-PPL parity
stage byte_serve 21600 python scripts/serve_byte_lm.py

echo "=== r4 CPU queue complete ($(date +%H:%M:%S)) ==="
