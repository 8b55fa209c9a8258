#!/bin/bash
# Round-3 queue 12: the machine reset wiped /tmp (queues 6-10 results lost)
# and data/byte_lm_ckpt.npz.  Re-takes the gating numbers in strict priority
# order on the recovered tunnel:
#   1. fused-kernel hardware parity (bench.py depends on it by default)
#   2. headline bench.py
#   3. north-star w4a4-vs-w8a8 stack ratio at full 32-layer geometry
#   4. phase decomposition, then the byte-LM retrain + FP4 ladder rungs
#   nohup bash scripts/r3_tpu_queue12.sh > /tmp/r3_queue12.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_tunnel() {
  while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe12.log 2>&1; do
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
echo "=== tunnel up at $(date +%H:%M:%S) ==="

# 1. fused MLP + qkv-ring + o_proj parity and per-layer timing on hardware.
#    Parity asserts => rc!=0 on failure; later stages then run unfused so
#    the numbers still land (and the default gets flipped in code).
if ! stage fusedmlp 2400 python scripts/ab_fused_mlp.py; then
  echo "=== fused kernels FAILED on hardware — disabling for later stages ==="
  export ATOM_TPU_NO_FUSED_MLP=1 ATOM_TPU_NO_FUSED_QKV=1
  touch /tmp/r3_fused_broken
fi

# 2. headline
stage bench3 2400 python bench.py

# 3. north-star ratio at full geometry
stage stacks_ratio 4800 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w4a4 w8a8

# 4. phase decomposition (where is the remaining step time)
stage phases2 2400 python scripts/ab_step_phases.py

# 5. w4a16 + bf16 rows for the full stack table
stage stacks_w4a16 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w4a16 bf16

# 6. retrain the byte-LM checkpoint (wiped with /tmp), then verify the fp16
#    PPL row reproduces the committed CSV before any FP4 backfill runs.
stage train_bytelm 3600 python scripts/train_corpus_model.py \
  --steps 2400 --out data/byte_lm_ckpt.npz
stage fp16check 3600 python -m atom_tpu.main byte-lm corpus --eval_ppl \
  --ckpt data/byte_lm_ckpt.npz --seqlen 2048 \
  --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache

# 7. FP4 ladder missing rungs (+clip, +gptq, +kv_cache) on TPU
BASE=(byte-lm corpus --eval_ppl --ckpt data/byte_lm_ckpt.npz --seqlen 2048)
run() { CSV=$1 NAME=$2; shift 2
  grep -q "^$NAME," "$CSV" 2>/dev/null && { echo "$NAME in $CSV"; return; }
  timeout 7200 python -m atom_tpu.main "${BASE[@]}" "$@" \
    | grep '^targetResult,' | sed "s/^/$NAME,/" | tee -a "$CSV"; }
FPC=ablation_byte-lm_fp.csv
echo "=== stage fp4rungs ($(date +%H:%M:%S)) ==="
run $FPC +clip     --quant_type fp --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --no-kv_cache
run $FPC +gptq     --quant_type fp --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --no-kv_cache
run $FPC +kv_cache --quant_type fp --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 --w_clip_ratio 0.85 --use_gptq --kv_cache
echo "=== stage fp4rungs done ($(date +%H:%M:%S)) ==="

# 8. remaining perf stages
stage longctx 3600 python scripts/measure_prefill_longctx.py \
  --layers 4 --ctx 2048 4096 8192
stage ttft4k 3600 python scripts/measure_ttft_4k.py --layers 16
stage moe_burst 2400 python -m atom_tpu.benchmarks.bench_textgen \
  --layers 8 --batch 32 --stacks moe
stage hosttax 2400 python scripts/measure_host_tax.py

echo "=== r3 queue 12 complete ($(date +%H:%M:%S)) ==="
