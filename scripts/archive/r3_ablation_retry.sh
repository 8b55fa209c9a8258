#!/bin/bash
# Re-run ablation rungs lost to the tunnel wedge (UNAVAILABLE backend),
# appending to ablation_byte-lm.csv in ladder position is NOT needed — the
# CSV is keyed by rung name; sort order is re-established by the ladder list.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CSV=ablation_byte-lm.csv
BASE=(byte-lm corpus --eval_ppl --ckpt data/byte_lm_ckpt.npz --seqlen 2048)
run() { NAME=$1; shift
  grep -q "^$NAME," "$CSV" && { echo "$NAME already present"; return; }
  python -m atom_tpu.main "${BASE[@]}" "$@" \
    | grep '^targetResult,' | sed "s/^/$NAME,/" | tee -a "$CSV"; }
run +keeper_int8  --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +group128     --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
run +clip         --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --no-kv_cache
run +gptq         --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --no-kv_cache
run +kv_cache     --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --kv_cache
