#!/bin/bash
# Round-3 queue 4: waits for queue 3, then runs the decode-kernel v4 A/B
# (block-diagonal page dots, two-pages-per-step) and re-benches if a
# variant wins.
#   nohup bash scripts/r3_tpu_queue4.sh > /tmp/r3_queue4.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while pgrep -f "bash scripts/r3_tpu_queue3.sh" > /dev/null; do sleep 120; done
echo "=== queue 3 done ($(date +%H:%M:%S)) ==="

timeout 2400 python scripts/ab_decode_v4.py --ctx 512 > /tmp/r3_dkv4_512.log 2>&1
tail -8 /tmp/r3_dkv4_512.log
timeout 2400 python scripts/ab_decode_v4.py --ctx 1024 > /tmp/r3_dkv4_1024.log 2>&1
tail -8 /tmp/r3_dkv4_1024.log
echo "=== r3 queue 4 complete ($(date +%H:%M:%S)) ==="
