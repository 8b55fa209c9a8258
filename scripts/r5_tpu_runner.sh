#!/bin/bash
# Round-5 serial TPU queue runner.
#
# Executes scripts/r5_queue/*.sh in lexical order (one at a time — the
# tunnel exposes ONE chip and jax clients are exclusive), logging each to
# /tmp/r5_<name>.log and moving finished stages to scripts/r5_queue_done/.
# Stages are added/reordered by dropping numbered files into the queue dir
# while the runner is live.  Touch scripts/r5_queue/STOP to stop after the
# current stage.
#
#   nohup bash scripts/r5_tpu_runner.sh > /tmp/r5_runner.log 2>&1 &
cd /root/repo
Q=scripts/r5_queue
DONE=scripts/r5_queue_done
mkdir -p "$Q" "$DONE"
export PYTHONPATH=/root/repo:/root/.axon_site
export ATOM_TPU_CACHE_DIR=${ATOM_TPU_CACHE_DIR:-/root/jax_cache}
# jax reads this at import — covers every stage without code changes
export JAX_COMPILATION_CACHE_DIR=$ATOM_TPU_CACHE_DIR

wait_tunnel() {  # the tunnel has wedged mid-queue before (r3) — probe first
  # 600s: jax import alone costs ~2 min when the single host core is
  # contended (the CPU accuracy ladder runs niced in the background)
  until timeout --kill-after=30 600 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum(x @ x)))" > /tmp/r5_tunnel_probe.log 2>&1; do
    echo "runner: tunnel unresponsive $(date +%H:%M:%S), retry in 120s"
    sleep 120
  done
}

while true; do
  if [ -e "$Q/STOP" ]; then echo "runner: STOP"; exit 0; fi
  # wait for the tunnel BEFORE selecting, so stages added during a wedge
  # are picked in priority order once it recovers
  wait_tunnel
  stage=$(ls "$Q" 2>/dev/null | grep '\.sh$' | sort | head -1)
  if [ -z "$stage" ]; then sleep 20; continue; fi
  name="${stage%.sh}"
  tmo=$(sed -n 's/^# TIMEOUT=\([0-9]*\).*/\1/p' "$Q/$stage" | head -1)
  tmo=${tmo:-7200}
  echo "=== stage $name start $(date +%H:%M:%S) timeout=${tmo}s ==="
  timeout --signal=TERM --kill-after=60 "$tmo" \
    bash "$Q/$stage" > "/tmp/r5_${name}.log" 2>&1
  rc=$?
  echo "=== stage $name done rc=$rc $(date +%H:%M:%S) ==="
  tail -4 "/tmp/r5_${name}.log" | sed 's/^/    /'
  mv "$Q/$stage" "$DONE/$stage"
done
