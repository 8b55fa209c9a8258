#!/bin/bash
# Round-3 CPU backfill: last in the serialized CPU queue (one core — see
# r3_cpu_followup.sh header).  Re-runs any ablation rung (INT or FP4) that
# the stage timeouts in r3_cpu_accuracy.sh cut short.  Keyed on CSV rows,
# so rungs that already landed are skipped; safe to re-run any time.
#   nohup bash scripts/r3_cpu_backfill.sh > /tmp/r3_cpu_backfill.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

while pgrep -f "bash scripts/r3_cpu_accuracy.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_cpu_followup.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_cpu_followup2.sh" > /dev/null \
   || pgrep -f "atom_tpu.main byte-lm corpus" > /dev/null; do sleep 240; done
echo "=== CPU queue drained, backfilling ($(date +%H:%M:%S)) ==="

BASE=(byte-lm corpus --eval_ppl --ckpt data/byte_lm_ckpt.npz --seqlen 2048)
# run <csv> <rung-name> <extra flags...>: skip if the rung row exists.
run() { CSV=$1 NAME=$2; shift 2
  grep -q "^$NAME," "$CSV" 2>/dev/null && { echo "$NAME in $CSV"; return; }
  timeout 14400 python -m atom_tpu.main "${BASE[@]}" "$@" \
    | grep '^targetResult,' | sed "s/^/$NAME,/" | tee -a "$CSV"; }

ladder() { CSV=$1; shift  # remaining args: e.g. --quant_type fp
  run "$CSV" fp16         --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache
  run "$CSV" base_rtn     "$@" --wbits 4 --abits 4 --no-reorder --keeper 0 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
  run "$CSV" +reorder     "$@" --wbits 4 --abits 4 --reorder --keeper 0 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
  run "$CSV" +keeper_int8 "$@" --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 0 --act_group_size 0 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
  run "$CSV" +group128    "$@" --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 1.0 --w_clip_ratio 1.0 --no-kv_cache
  run "$CSV" +clip        "$@" --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --no-kv_cache
  run "$CSV" +gptq        "$@" --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --no-kv_cache
  run "$CSV" +kv_cache    "$@" --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --kv_cache; }

ladder ablation_byte-lm.csv
ladder ablation_byte-lm_fp.csv --quant_type fp

echo "=== r3 CPU backfill complete ($(date +%H:%M:%S)) ==="
