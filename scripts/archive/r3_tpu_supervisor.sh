#!/bin/bash
# Round-3 TPU supervisor: waits for queues 6 and 7 to exit, then re-runs any
# hardware stage that never started or timed out (a mid-queue tunnel wedge
# makes those queues stop early by design).  Stage completion is keyed on the
# queue logs: a stage is DONE iff its "=== stage <name>" header appeared and
# no "stage <name> TIMED OUT" marker follows.  Completed stages are never
# re-run; safe to restart this script any time.
#   nohup bash scripts/r3_tpu_supervisor.sh > /tmp/r3_supervisor.log 2>&1 &
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while pgrep -f "bash scripts/r3_tpu_queue6.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_tpu_queue7.sh" > /dev/null; do sleep 240; done
echo "=== queues 6+7 exited ($(date +%H:%M:%S)) ==="

wait_tunnel() {
  while ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/probe_sup.log 2>&1; do
    sleep 180
  done
  echo "=== tunnel up ($(date +%H:%M:%S)) ==="
}

SELF=/tmp/r3_supervisor_stages.log
touch "$SELF"
MERGED=/tmp/r3_stage_state.log
cat /tmp/r3_queue6.log /tmp/r3_queue7.log "$SELF" > "$MERGED" 2>/dev/null

is_done() {  # is_done <stage>
  grep -q "=== stage $1 " "$MERGED" 2>/dev/null \
    && ! grep -q "stage $1 TIMED OUT" "$MERGED" 2>/dev/null
}

stage() {  # stage <name> <timeout_s> <cmd...> ; returns the command's rc
  local name=$1 tmo=$2; shift 2
  if is_done "$name"; then echo "--- $name already done"; return 0; fi
  echo "=== running $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  tail -8 "/tmp/r3_${name}.log"
  if [ $rc -eq 124 ]; then
    echo "=== $name timed out — waiting for tunnel, then one retry ==="
    wait_tunnel
    timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
    rc=$?
    tail -8 "/tmp/r3_${name}.log"
  fi
  if [ $rc -ne 124 ]; then
    echo "=== stage $name " >> "$SELF"     # completion marker (incl. rc!=0:
    echo "=== stage $name " >> "$MERGED"   # a real failure, not a wedge)
  fi
  return $rc
}

wait_tunnel

stage ringhw       2400 python scripts/ab_ring_kernel_hw.py
stage ringfold2    2400 python scripts/ab_ring_fold.py
if ! is_done fusedmlp; then
  stage fusedmlp 2400 python scripts/ab_fused_mlp.py \
    || export ATOM_TPU_NO_FUSED_MLP=1  # parity asserts => rc!=0 on failure
fi
stage bench3       2400 python bench.py
stage phases2      2400 python scripts/ab_step_phases.py
stage dkv4_512     2400 python scripts/ab_decode_v4.py --ctx 512
stage dkv4_1024    2400 python scripts/ab_decode_v4.py --ctx 1024
stage stacks_ratio 4800 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w4a4 w8a8
stage stacks_w4a16 3600 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 32 --stacks w4a16
stage bf16b        2400 python -m atom_tpu.benchmarks.bench_textgen \
  --model 7b --layers 32 --batch 2 --ctx 256 --stacks bf16
stage longctx      3600 python scripts/measure_prefill_longctx.py \
  --layers 4 --ctx 2048 4096 8192
stage ttft4k       3600 python scripts/measure_ttft_4k.py --layers 16
stage moe_burst    2400 python -m atom_tpu.benchmarks.bench_textgen \
  --layers 8 --batch 32 --stacks moe

echo "=== r3 supervisor complete ($(date +%H:%M:%S)) ==="
