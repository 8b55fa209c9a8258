# TIMEOUT=7200
# Triage the ctx-2048 one-pass prefill hardware failure seen in stage 45
# (hw_smoke's longctx2048 probe passed 12/12 pre-reset): re-run the smoke
# probes post-reset, then the measure script with full tracebacks.
cd /root/repo
set -x
python scripts/hw_smoke.py --paths longctx2048,longctx2048_scan
python scripts/measure_prefill_longctx.py --layers 4 --ctx 2048
