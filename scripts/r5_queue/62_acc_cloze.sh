# TIMEOUT=10800
# First real zero-shot number (VERDICT r4 missing #1): corpus cloze,
# fp16 vs W4A4, on the TPU.  model/main.py:281-332 analog.
export JAX_DEFAULT_MATMUL_PRECISION=highest
cd /root/repo
set -x
python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --wbits 16 --abits 16 --no-reorder --keeper 0 --calib_samples 2 \
  2>&1 | tee /tmp/r5_cloze_fp16_inner.log
python -m atom_tpu.main byte-lm corpus \
  --ckpt data/byte_lm_ckpt.npz --eval_common_sense --zs_tasks corpus_cloze \
  --wbits 4 --abits 4 --reorder --keeper 128 --keeper_precision 3 \
  --weight_group_size 128 --act_group_size 128 --a_clip_ratio 0.9 \
  --w_clip_ratio 0.85 --use_gptq \
  2>&1 | tee /tmp/r5_cloze_w4a4_inner.log
{
  echo "task,config,acc"
  grep -h "^INFO corpus_cloze :" /tmp/r5_cloze_fp16_inner.log | sed 's/^INFO /fp16,/' || true
  grep -h "^INFO corpus_cloze :" /tmp/r5_cloze_w4a4_inner.log | sed 's/^INFO /w4a4,/' || true
} > zeroshot_byte-lm.csv
cat zeroshot_byte-lm.csv
