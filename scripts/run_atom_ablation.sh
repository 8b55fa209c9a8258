#!/bin/bash
# Feature-ablation ladder (the analog of scripts/run_atom_ablation.sh):
# rtn -> +reorder -> +keeper INT8 -> +group128 -> +clip -> +gptq -> +kv.
#
# Usage:
#   run_atom_ablation.sh <model> [hf_path]               # HF checkpoint path
#   DATASET=corpus CKPT=data/byte_lm_ckpt.npz \
#     run_atom_ablation.sh byte-lm                       # trained byte model
#
# Env:
#   DATASET  calibration/eval dataset (default wikitext2; "corpus" = the
#            vendored real-text byte corpus, see data/corpus/PROVENANCE.md)
#   CKPT     npz pytree checkpoint from scripts/train_corpus_model.py
#   SEQLEN   eval window (default: model default)
#   QTYPE    int | fp  (fp = FP4 body, BASELINE.md:30's FP4 rows)
set -e
MODEL=${1:-opt-125m}
HF=${2:-}
DATASET=${DATASET:-wikitext2}
BASE=("$MODEL" "$DATASET" --eval_ppl)
[ -n "$HF" ] && BASE+=(--hf_path "$HF")
[ -n "$CKPT" ] && BASE+=(--ckpt "$CKPT")
[ -n "$SEQLEN" ] && BASE+=(--seqlen "$SEQLEN")
[ -n "$QTYPE" ] && BASE+=(--quant_type "$QTYPE")
SUFFIX=${QTYPE:+_$QTYPE}
CSV="ablation_${MODEL}${SUFFIX}.csv"
run() { NAME=$1; shift; echo "=== $NAME ==="; \
  python -m atom_tpu.main "${BASE[@]}" "$@" \
  | grep '^targetResult,' | sed "s/^/$NAME,/" | tee -a "$CSV"; }
rm -f "$CSV"
run fp16          --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache
run base_rtn      --wbits 4 --abits 4 --no-reorder --keeper 0 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +reorder      --wbits 4 --abits 4 --reorder    --keeper 0 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +keeper_int8  --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +group128     --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +clip         --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --no-kv_cache
run +gptq         --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --no-kv_cache
run +kv_cache     --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --kv_cache
