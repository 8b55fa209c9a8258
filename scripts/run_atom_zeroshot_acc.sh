#!/bin/bash
# Zero-shot accuracy (the analog of scripts/run_atom_zeroshot_acc.sh):
# piqa / arc / boolq / hellaswag / winogrande via loglikelihood ranking.
set -e
MODEL=${1:-llama2-7b}
HF=${2:-}
ARGS=(
  "$MODEL" wikitext2
  --wbits 4 --abits 4 --weight_group_size 128 --act_group_size 128
  --weight_channel_group 2 --reorder --keeper 128 --keeper_precision 3
  --a_clip_ratio 0.9 --w_clip_ratio 0.85 --kv_cache --use_gptq
  --eval_common_sense
  --zs_tasks piqa arc_easy arc_challenge boolq hellaswag winogrande
)
[ -n "$HF" ] && ARGS+=(--hf_path "$HF")
python -m atom_tpu.main "${ARGS[@]}" | tee "zeroshot_${MODEL}.log"
grep '^INFO ' "zeroshot_${MODEL}.log" > "zeroshot_${MODEL}.csv"
