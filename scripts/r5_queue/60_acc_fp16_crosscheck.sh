# TIMEOUT=2400
# Cross-device comparability check before trusting any TPU accuracy row:
# recompute the byte-LM fp16 corpus PPL on the TPU and compare with the
# CPU INT-ladder row (2.593714).  |delta| < 0.01 => TPU ladders are
# internally consistent AND comparable with the CPU INT CSV.
export JAX_DEFAULT_MATMUL_PRECISION=highest
cd /root/repo
python -m atom_tpu.main byte-lm corpus --eval_ppl --ckpt data/byte_lm_ckpt.npz \
  --seqlen 2048 --wbits 16 --abits 16 --no-reorder --keeper 0 --no-kv_cache \
  | grep '^targetResult,' | sed 's/^/tpu-fp16,/'
echo "CPU row was: fp16,targetResult,corpus,2.593714"
