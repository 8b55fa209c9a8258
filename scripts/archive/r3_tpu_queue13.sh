#!/bin/bash
# Round-3 queue 13: follow-on behind queue 12 — re-takes the lost queue-9/10
# stages (LoRA serving cost, 13B config-3 rows, 70B GQA slice) plus the
# Mixtral INT-vs-FP4 delta and the byte-LM export journey, both moved from
# the (single-core) CPU queue onto the TPU.
#   nohup bash scripts/r3_tpu_queue13.sh > /tmp/r3_queue13.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while pgrep -f "bash scripts/r3_tpu_queue12.sh" > /dev/null; do sleep 240; done
echo "=== queue 12 done ($(date +%H:%M:%S)) ==="

wait_tunnel() {
  while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe13.log 2>&1; do
    sleep 120
  done
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== stage $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  tail -8 "/tmp/r3_${name}.log"
  if [ $rc -eq 124 ]; then
    echo "=== $name timed out — waiting for tunnel, one retry ==="
    wait_tunnel
    timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
    rc=$?
    tail -8 "/tmp/r3_${name}.log"
  fi
  echo "=== stage $name done rc=$rc ($(date +%H:%M:%S)) ==="
  return $rc
}

wait_tunnel
[ -f /tmp/r3_fused_broken ] && export ATOM_TPU_NO_FUSED_MLP=1 ATOM_TPU_NO_FUSED_QKV=1

# LoRA serving cost (rank-16 distinct adapters; lora/w4a4 same-slice ratio)
stage lora_burst 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 16 --batch 32 --stacks w4a4 lora

# 13B rows (north-star config 3): 20-layer slice bs32 + full 40 layers bs16
stage 13b_slice 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 13b --layers 20 --batch 32 --stacks w4a4 w8a8
stage 13b_full 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 13b --layers 40 --batch 16 --stacks w4a4

# 70B GQA decode slice
stage 70b_slice 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 70b --layers 8 --batch 32 --stacks w4a4

# Mixtral INT-vs-FP4 W4A4 PPL delta (BASELINE.md:30 analog) on TPU
MIX=(tiny-mixtral synthetic --eval_ppl --seqlen 512 --calib_samples 8
     --wbits 4 --abits 4 --weight_group_size 128 --act_group_size 128
     --weight_channel_group 2 --reorder --keeper 128 --keeper_precision 3
     --a_clip_ratio 0.9 --w_clip_ratio 0.85 --kv_cache --use_gptq)
mixrow() { NAME=$1; shift
  grep -q "^$NAME," ablation_fp4-vs-int4.csv 2>/dev/null && return
  timeout 7200 python -m atom_tpu.main "$@" > "/tmp/r3_${NAME}.log" 2>&1
  grep '^targetResult,' "/tmp/r3_${NAME}.log" | sed "s/^/$NAME,/" \
    | tee -a ablation_fp4-vs-int4.csv; }
echo "=== stage mixtral_delta ($(date +%H:%M:%S)) ==="
mixrow mixtral-int4 "${MIX[@]}" --quant_type int
mixrow mixtral-fp4  "${MIX[@]}" --quant_type fp
mixrow mixtral-fp16 tiny-mixtral synthetic --eval_ppl --seqlen 512 \
  --calib_samples 2 --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache
echo "=== stage mixtral_delta done ($(date +%H:%M:%S)) ==="

# Byte-LM full-depth export -> engine generation -> served-vs-accuracy PPL
stage byte_export 7200 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --use_gptq --reorder \
  --calib_samples 8 --seqlen 512 --export_serving data/byte_lm_serving
stage byte_generate 3600 python scripts/generate.py \
  --serving_dir data/byte_lm_serving \
  --prompt "The captain stood on the deck and " \
  --prompt "It was a dark and stormy night. " --tokens 256
stage byte_ppl 7200 python scripts/serve_byte_lm.py --seqlen 512 --windows 8

echo "=== r3 queue 13 complete ($(date +%H:%M:%S)) ==="
