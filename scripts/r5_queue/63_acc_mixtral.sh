# TIMEOUT=10800
# Mixtral INT4-vs-FP4 delta (north-star config 5 accuracy half), on TPU.
export JAX_DEFAULT_MATMUL_PRECISION=highest
cd /root/repo
set -x
rm -f ablation_fp4-vs-int4.csv
COMMON="tiny-mixtral synthetic --eval_ppl --seqlen 512 --calib_samples 2
  --wbits 4 --abits 4 --weight_group_size 128 --act_group_size 128
  --weight_channel_group 2 --reorder --keeper 128 --keeper_precision 3
  --a_clip_ratio 0.9 --w_clip_ratio 0.85 --kv_cache --use_gptq"
python -m atom_tpu.main $COMMON --quant_type int \
  | grep "^targetResult," | sed 's/^/mixtral-int4,/' | tee -a ablation_fp4-vs-int4.csv
python -m atom_tpu.main $COMMON --quant_type fp \
  | grep "^targetResult," | sed 's/^/mixtral-fp4,/' | tee -a ablation_fp4-vs-int4.csv
python -m atom_tpu.main tiny-mixtral synthetic --eval_ppl \
  --seqlen 512 --calib_samples 2 --wbits 16 --abits 16 --no-reorder \
  --keeper 0 --no-kv_cache \
  | grep "^targetResult," | sed 's/^/mixtral-fp16,/' | tee -a ablation_fp4-vs-int4.csv
cat ablation_fp4-vs-int4.csv
