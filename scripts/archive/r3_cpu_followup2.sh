#!/bin/bash
# Round-3 CPU follow-up 2: serialized behind r3_cpu_followup.sh (one core —
# see that script's header).  Closes VERDICT r2 #8's Mixtral half: the
# INT-vs-FP4 W4A4 PPL delta on tiny-mixtral (synthetic corpus; the byte-lm
# FP4 ladder in r3_cpu_accuracy.sh covers the Llama-architecture half on
# real text).  Analog of BASELINE.md:30 (Mixtral INT 4.41 vs FP4 4.50).
#   nohup bash scripts/r3_cpu_followup2.sh > /tmp/r3_cpu_followup2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

while pgrep -f "bash scripts/r3_cpu_accuracy.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_cpu_followup.sh" > /dev/null; do sleep 180; done
echo "=== follow-up queue clear ($(date +%H:%M:%S)) ==="

COMMON=(tiny-mixtral synthetic --eval_ppl --seqlen 512 --calib_samples 8
        --wbits 4 --abits 4 --weight_group_size 128 --act_group_size 128
        --weight_channel_group 2 --reorder --keeper 128 --keeper_precision 3
        --a_clip_ratio 0.9 --w_clip_ratio 0.85 --kv_cache --use_gptq)

timeout 10800 python -m atom_tpu.main "${COMMON[@]}" --quant_type int \
  > /tmp/r3_mixtral_int.log 2>&1
grep "^targetResult," /tmp/r3_mixtral_int.log | sed 's/^/mixtral-int4,/' \
  | tee -a ablation_fp4-vs-int4.csv

timeout 10800 python -m atom_tpu.main "${COMMON[@]}" --quant_type fp \
  > /tmp/r3_mixtral_fp4.log 2>&1
grep "^targetResult," /tmp/r3_mixtral_fp4.log | sed 's/^/mixtral-fp4,/' \
  | tee -a ablation_fp4-vs-int4.csv

# fp16 reference point for the delta
timeout 7200 python -m atom_tpu.main tiny-mixtral synthetic --eval_ppl \
  --seqlen 512 --calib_samples 2 --wbits 16 --abits 16 --no-reorder \
  --keeper 0 --no-kv_cache > /tmp/r3_mixtral_fp16.log 2>&1
grep "^targetResult," /tmp/r3_mixtral_fp16.log | sed 's/^/mixtral-fp16,/' \
  | tee -a ablation_fp4-vs-int4.csv

echo "=== r3 CPU follow-up 2 complete ($(date +%H:%M:%S)) ==="
