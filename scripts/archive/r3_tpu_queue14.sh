#!/bin/bash
# Round-3 queue 14: recovery with the FIXED qkv-ring kernel.
#
# The post-reset toolchain rejects sub-32-bit dim-insertion in Mosaic
# ("Insertion of minor dim that is not a no-op only supported for 32-bit
# types"), which broke packed_w4_gemm_qkv_ring{,_fused} — and with it
# bench.py, the stacks ratio, and ab_step_phases (all compile errors, see
# /tmp/r3_bench3.log from queue 12).  Separately, the fused-MLP kernel now
# DIVERGES numerically on hardware (ab_fused_mlp parity failure, ~9% of
# outputs beyond rtol 5e-2/atol 1.0) — probe_fused_divergence bisects it.
#
# Order: validate the ring fix bitwise -> bisect the MLP divergence ->
# headline bench -> north-star stack ratio, with fused features enabled
# only where the probes prove them clean on this toolchain.
#   nohup bash scripts/r3_tpu_queue14.sh <wait_pid> > /tmp/r3_queue14.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== pid $WAIT_PID done ($(date +%H:%M:%S)) ==="
  tail -6 /tmp/r3_stacks_w4a16.log
fi

wait_tunnel() {
  while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe14.log 2>&1; do
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
echo "=== tunnel up ($(date +%H:%M:%S)) ==="

# 1. ring-fold fix: bitwise parity vs packed_w4_gemm_qkv + write_hot
if ! stage ringfix 1800 python scripts/ab_ring_fold.py; then
  echo "=== ring kernel still broken — later stages cannot run w4a4 ==="
  touch /tmp/r3_ring_broken
fi

# 2. bisect the fused-MLP hardware divergence
stage probes 2400 python scripts/probe_fused_divergence.py

# fused gating from probe results: a probe line is clean when its
# mismatch fraction is 0.0000%
export ATOM_TPU_NO_FUSED_MLP=1 ATOM_TPU_NO_FUSED_QKV=1
if grep -q '^\[mlp\] mismatch[^ ]*: 0.0000%' /tmp/r3_probes.log; then
  unset ATOM_TPU_NO_FUSED_MLP
fi
if grep -q '^\[norm\] mismatch[^ ]*: 0.0000%' /tmp/r3_probes.log; then
  unset ATOM_TPU_NO_FUSED_QKV
fi
echo "fused gates: MLP=${ATOM_TPU_NO_FUSED_MLP:-on} QKV=${ATOM_TPU_NO_FUSED_QKV:-on}"

if [ ! -f /tmp/r3_ring_broken ]; then
  # 3. headline
  stage bench14 2400 python bench.py
  # 4. north-star ratio at full geometry
  stage stacks14 4800 python -m atom_tpu.benchmarks.bench_textgen \
    --model 7b --layers 32 --batch 32 --stacks w4a4 w8a8
  # 5. phase decomposition
  stage phases14 2400 python scripts/ab_step_phases.py
fi

# 6. byte-LM retrain + fp16 reproduction check (unblocks FP4 rungs + cloze)
stage train_bytelm 3600 python scripts/train_corpus_model.py \
  --steps 2400 --out data/byte_lm_ckpt.npz
stage fp16check 3600 python -m atom_tpu.main byte-lm corpus --eval_ppl \
  --ckpt data/byte_lm_ckpt.npz --seqlen 2048 \
  --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache

# 7. FP4 ladder missing rungs
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

echo "=== r3 queue 14 complete ($(date +%H:%M:%S)) ==="
