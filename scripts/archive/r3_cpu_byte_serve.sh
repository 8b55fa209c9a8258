#!/bin/bash
# Round-3: full-depth byte-LM calibrate -> export -> engine generation +
# served-vs-accuracy PPL parity (CPU; queued behind the accuracy ladders).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

# wait for the FP4 ladder + followups to release the single CPU core
while pgrep -f "bash scripts/r3_cpu_accuracy.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_cpu_followup2.sh" > /dev/null \
   || pgrep -f "bash scripts/r3_cpu_backfill.sh" > /dev/null; do sleep 240; done

timeout 14400 python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --use_gptq --reorder \
  --calib_samples 8 --seqlen 512 \
  --export_serving data/byte_lm_serving > /tmp/r3_byte_export.log 2>&1
tail -3 /tmp/r3_byte_export.log

timeout 7200 python scripts/generate.py \
  --serving_dir data/byte_lm_serving \
  --prompt "The captain stood on the deck and " \
  --prompt "It was a dark and stormy night. " \
  --tokens 256 > /tmp/r3_byte_generate.log 2>&1
tail -20 /tmp/r3_byte_generate.log

timeout 14400 python scripts/serve_byte_lm.py --seqlen 512 --windows 8 \
  > /tmp/r3_byte_ppl.log 2>&1
tail -5 /tmp/r3_byte_ppl.log
echo "=== byte-serve queue done ($(date +%H:%M:%S)) ==="
