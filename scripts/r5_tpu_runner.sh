#!/bin/bash
# Round-5 serial TPU queue runner (v2: stalled-stage watchdog).
#
# Executes scripts/r5_queue/*.sh in lexical order, one at a time, logging
# each to /tmp/r5_<name>.log and moving finished stages to
# scripts/r5_queue_done/.  Touch scripts/r5_queue/STOP to stop after the
# current stage.
#
# Tunnel pathology (observed repeatedly this round): a jax client that
# CONNECTS while the tunnel is wedged hangs FOREVER on its first device op
# — even after the tunnel recovers for new connections.  So besides the
# pre-stage probe, a watchdog kills any stage whose log hasn't grown for
# 25 minutes (generous: full-model compiles are silent for up to ~19 min)
# and retries it up to 3 times.
#
#   nohup bash scripts/r5_tpu_runner.sh > /tmp/r5_runner.log 2>&1 &
cd /root/repo
Q=scripts/r5_queue
DONE=scripts/r5_queue_done
mkdir -p "$Q" "$DONE"
export PYTHONPATH=/root/repo:/root/.axon_site
export ATOM_TPU_CACHE_DIR=${ATOM_TPU_CACHE_DIR:-/root/jax_cache}
export JAX_COMPILATION_CACHE_DIR=$ATOM_TPU_CACHE_DIR

STALL_S=1500

wait_tunnel() {
  until timeout --kill-after=30 600 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/r5_tunnel_probe.log 2>&1; do
    echo "runner: tunnel unresponsive $(date +%H:%M:%S), retry in 120s"
    sleep 120
  done
}

run_stage() {  # $1 = stage file; returns the stage's rc (99 = gave up)
  local stage=$1 name tmo rc attempt
  name="${stage%.sh}"
  tmo=$(sed -n 's/^# TIMEOUT=\([0-9]*\).*/\1/p' "$Q/$stage" | head -1)
  tmo=${tmo:-7200}
  for attempt in 1 2 3; do
    echo "=== stage $name start $(date +%H:%M:%S) timeout=${tmo}s attempt=$attempt ==="
    setsid bash "$Q/$stage" > "/tmp/r5_${name}.log" 2>&1 &
    local pid=$! t0=$(date +%s) last_size=-1 last_change=$(date +%s) stalled=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 20
      local now=$(date +%s)
      local size=$(stat -c %s "/tmp/r5_${name}.log" 2>/dev/null || echo 0)
      if [ "$size" != "$last_size" ]; then last_size=$size; last_change=$now; fi
      if [ $((now - t0)) -gt "$tmo" ]; then
        echo "stage $name TIMEOUT after ${tmo}s"; stalled=2
        kill -TERM -- -"$pid" 2>/dev/null; sleep 10
        kill -KILL -- -"$pid" 2>/dev/null; break
      fi
      if [ $((now - last_change)) -gt $STALL_S ]; then
        echo "stage $name STALLED (no output ${STALL_S}s) $(date +%H:%M:%S)"
        stalled=1
        kill -TERM -- -"$pid" 2>/dev/null; sleep 10
        kill -KILL -- -"$pid" 2>/dev/null; break
      fi
    done
    wait "$pid" 2>/dev/null; rc=$?
    if [ "$stalled" = 1 ]; then wait_tunnel; continue; fi
    [ "$stalled" = 2 ] && rc=124
    return $rc
  done
  return 99
}

while true; do
  if [ -e "$Q/STOP" ]; then echo "runner: STOP"; exit 0; fi
  wait_tunnel
  stage=$(ls "$Q" 2>/dev/null | grep '\.sh$' | sort | head -1)
  if [ -z "$stage" ]; then sleep 20; continue; fi
  run_stage "$stage"
  rc=$?
  name="${stage%.sh}"
  echo "=== stage $name done rc=$rc $(date +%H:%M:%S) ==="
  tail -4 "/tmp/r5_${name}.log" | sed 's/^/    /'
  mv "$Q/$stage" "$DONE/$stage"
done
