# TIMEOUT=21600
# FP4 ablation ladder on the round-4 checkpoint, on the TPU (VERDICT r4
# missing #3: the FP4 tail never completed on CPU — one core, ~60 min/rung).
# Writes ablation_byte-lm_fp.csv (all 8 rungs).
export JAX_DEFAULT_MATMUL_PRECISION=highest
cd /root/repo
DATASET=corpus CKPT=data/byte_lm_ckpt.npz SEQLEN=2048 QTYPE=fp \
  bash scripts/run_atom_ablation.sh byte-lm
echo "=== ladder done ==="
cat ablation_byte-lm_fp.csv
