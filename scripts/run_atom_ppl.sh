#!/bin/bash
# Canonical Atom W4A4 PPL run (the analog of the reference's
# scripts/run_atom_ppl.sh: group 128, channel-group 2, clip 0.9/0.85,
# 128 INT8 keepers, GPTQ, INT4 KV cache).
#
#   ./scripts/run_atom_ppl.sh <model> [<hf_checkpoint_dir>] [extra flags...]
#
# Without a checkpoint dir the geometry runs with random weights on synthetic
# data (smoke / machinery check); results print as `targetResult,<ds>,<ppl>`.
set -e
MODEL=${1:-llama2-7b}
HF=${2:-}
shift $(( $# > 2 ? 2 : $# )) || true
EXTRA=("$@")
ARGS=(
  "$MODEL" wikitext2
  --wbits 4 --abits 4
  --weight_group_size 128 --act_group_size 128 --weight_channel_group 2
  --reorder --act_sort_metric hessian
  --keeper 128 --keeper_precision 3
  --a_clip_ratio 0.9 --w_clip_ratio 0.85
  --kv_cache --use_gptq
  --eval_ppl --eval_datasets wikitext2 ptb c4
)
[ -n "$HF" ] && ARGS+=(--hf_path "$HF")
python -m atom_tpu.main "${ARGS[@]}" "${EXTRA[@]}" | tee "ppl_${MODEL}.log"
grep '^targetResult,' "ppl_${MODEL}.log" > "ppl_${MODEL}.csv"
