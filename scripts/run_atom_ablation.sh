#!/bin/bash
# Feature-ablation ladder (the analog of scripts/run_atom_ablation.sh):
# rtn -> +reorder -> +keeper INT8 -> +group128 -> +clip -> +gptq -> +kv.
set -e
MODEL=${1:-opt-125m}
HF=${2:-}
BASE=("$MODEL" wikitext2 --eval_ppl)
[ -n "$HF" ] && BASE+=(--hf_path "$HF")
run() { NAME=$1; shift; echo "=== $NAME ==="; \
  python -m atom_tpu.main "${BASE[@]}" "$@" \
  | grep '^targetResult,' | sed "s/^/$NAME,/" | tee -a "ablation_${MODEL}.csv"; }
rm -f "ablation_${MODEL}.csv"
run base_rtn      --wbits 4 --abits 4 --no-reorder --keeper 0 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +reorder      --wbits 4 --abits 4 --reorder    --keeper 0 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +keeper_int8  --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +group128     --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +clip         --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --no-kv_cache
run +gptq         --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --no-kv_cache
run +kv_cache     --wbits 4 --abits 4 --reorder    --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --kv_cache
