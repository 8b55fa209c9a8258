#!/bin/bash
# Round-3 CPU follow-up: serialized behind r3_cpu_accuracy.sh (this box has
# ONE core — concurrent 8-virtual-device runs starve XLA's collective
# rendezvous and die on its check-failure).
#   nohup bash scripts/r3_cpu_followup.sh > /tmp/r3_cpu_followup.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

while pgrep -f "bash scripts/r3_cpu_accuracy.sh" > /dev/null; do sleep 120; done
echo "=== accuracy queue done ($(date +%H:%M:%S)) ==="

# 1. 70B-geometry engine run on the virtual TP8 mesh (VERDICT r2 #6's
#    unfinished half; the 17:30 attempt ran concurrently with training and
#    check-failed in the collective rendezvous)
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 7200 python scripts/mem_budget_70b.py --layers 2 \
  > /tmp/r3_70b_engine.log 2>&1
grep -vE "^\s+@|rendezvous" /tmp/r3_70b_engine.log | tail -10

# 2. driver-contract dryrun at HEAD
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 3600 python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip(8): OK')" > /tmp/r3_dryrun.log 2>&1
tail -3 /tmp/r3_dryrun.log

# 3. full pytest suite at HEAD
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 3600 python -m pytest tests/ -q > /tmp/r3_pytest_full.log 2>&1
tail -3 /tmp/r3_pytest_full.log

echo "=== r3 CPU follow-up complete ($(date +%H:%M:%S)) ==="
