# TIMEOUT=7200
# North-star stack ratio at HEAD (VERDICT r4 #2): w4a4 vs w8a8 decode at
# full 32L/bs32 — the number gets committed to STATUS.md this round, every
# round.  Reference same-harness ratio: 2052.8/1189.6 = 1.73x.
cd /root/repo
python -m atom_tpu.benchmarks.bench_textgen --stacks w4a4 w8a8 --layers 32 --batch 32 --ctx 512
