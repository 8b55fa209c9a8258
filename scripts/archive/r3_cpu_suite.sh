#!/bin/bash
# Full pytest suite at HEAD, queued behind every other CPU job.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
while pgrep -f "bash scripts/r3_cpu_accuracy.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_cpu_followup2.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_cpu_backfill.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_cpu_byte_serve.sh" > /dev/null; do sleep 240; done
timeout 7200 python -m pytest tests/ -q > /tmp/r3_full_suite.log 2>&1
tail -3 /tmp/r3_full_suite.log
