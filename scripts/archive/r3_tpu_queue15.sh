#!/bin/bash
# Round-3 queue 15: follow-on behind queue 14's stacks stage.
#
# Queue 14 established on the post-reset toolchain: ring-fold fix bitwise
# (ringfix), fused qkv/o_proj prologues probe-clean, fused-MLP kernel
# divergent, bench 1684.7 tok/s all-fused-off.  This queue re-probes the
# fused-MLP kernel after the full-tile dynamic-store rewrite; if clean, it
# re-takes the headline with every fused feature on, then runs the
# accuracy-ladder stages (byte-LM retrain, FP4 rungs) and remaining perf
# stages.
#   nohup bash scripts/r3_tpu_queue15.sh <wait_pid> > /tmp/r3_queue15.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== pid $WAIT_PID done ($(date +%H:%M:%S)) ==="
  tail -8 /tmp/r3_stacks14.log
fi

wait_tunnel() {
  while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe15.log 2>&1; do
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

# 1. re-probe the rewritten fused-MLP kernel (full-tile dynamic stores)
stage probes2 2400 python scripts/probe_fused_divergence.py --probes mlp0,mlp

if grep -q '^\[mlp\] mismatch[^ ]*: 0.0000%' /tmp/r3_probes2.log \
   && grep -q '^\[mlp0\] mismatch[^ ]*: 0.0000%' /tmp/r3_probes2.log; then
  echo "=== fused MLP clean after rewrite: re-take headline fully fused ==="
  export ATOM_TPU_FUSED_MLP=1
  stage bench15 2400 python bench.py
else
  echo "=== fused MLP still divergent — headline stays unfused-MLP ==="
  # re-take the headline anyway: the o_proj fused-in split (probe-clean,
  # default on) landed after queue 14's bench ran
  stage bench15 2400 python bench.py
fi

# 2. phase decomposition at the current default configuration
stage phases15 2400 python scripts/ab_step_phases.py

# 3. byte-LM retrain + fp16 reproduction check (unblocks FP4 rungs + cloze)
stage train_bytelm 3600 python scripts/train_corpus_model.py \
  --steps 2400 --out data/byte_lm_ckpt.npz
stage fp16check 3600 python -m atom_tpu.main byte-lm corpus --eval_ppl \
  --ckpt data/byte_lm_ckpt.npz --seqlen 2048 \
  --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache

# 4. FP4 ladder missing rungs
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

# 5. real-text zero-shot cloze (fp16 vs W4A4) — the zeroshot harness's
#    first real-task score (VERDICT r2 missing #3 tail)
stage cloze_fp16 3600 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --wbits 16 --abits 16 --no-reorder --keeper 0 --calib_samples 2
stage cloze_w4a4 5400 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 \
  --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 \
  --w_clip_ratio 0.85 --use_gptq

# 6. remaining perf stages
stage longctx 3600 python scripts/measure_prefill_longctx.py \
  --layers 4 --ctx 2048 4096 8192
stage ttft4k 3600 python scripts/measure_ttft_4k.py --layers 16
stage moe_burst 2400 python -m atom_tpu.benchmarks.bench_textgen \
  --layers 8 --batch 32 --stacks moe
stage hosttax 2400 python scripts/measure_host_tax.py

echo "=== r3 queue 15 complete ($(date +%H:%M:%S)) ==="
