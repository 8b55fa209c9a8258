# TIMEOUT=7200
# Retrain the byte-LM accuracy fixture: the 2026-08-20 machine reset wiped
# the gitignored data/byte_lm_ckpt.npz the committed INT ladder was
# computed on.  Seeded (seed=0, 2400 steps) — the acc driver's fp16
# cross-check then tells us how close the retrained ckpt's PPL lands to
# the round-4 one (2.593714); both ladders re-run on THIS ckpt either way.
cd /root/repo
python scripts/train_corpus_model.py --steps 2400 --out data/byte_lm_ckpt.npz
