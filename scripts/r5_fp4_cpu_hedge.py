#!/usr/bin/env python
"""CPU hedge for the FP4 ladder, rungs in VALUE order (tunnel outage plan).

The most important FP4 numbers are the full-recipe rungs (+gptq, +kv):
they give the trained-model INT-vs-FP4 delta (BASELINE.md:30's ordering,
vs the INT ladder's 2.650/2.666).  Earlier rungs follow if time remains.
Appends to ablation_byte-lm_fp_cpu.csv in completion order; the fp16 row
is identical to the INT ladder's (no quantization) and is copied in.

    JAX_PLATFORMS=cpu python scripts/r5_fp4_cpu_hedge.py
"""
import sys

sys.path.insert(0, "/root/repo/scripts")
from r5_acc_driver import BYTE, run  # noqa: E402

CSV = "ablation_byte-lm_fp_cpu.csv"

FP = ["--quant_type", "fp"]
Q4 = ["--wbits", "4", "--abits", "4"]
NOG = ["--weight_group_size", "0", "--act_group_size", "0",
       "--a_clip_ratio", "1.0", "--w_clip_ratio", "1.0"]
G128 = ["--weight_group_size", "128", "--act_group_size", "128"]
CLIP = ["--a_clip_ratio", "0.9", "--w_clip_ratio", "0.85"]
KEEP = ["--keeper", "128", "--keeper_precision", "3"]

RUNGS = [  # value order, not ladder order
    ("+gptq", Q4 + ["--reorder"] + KEEP + G128 + CLIP
     + ["--use_gptq", "--no-kv_cache"]),
    ("+kv_cache", Q4 + ["--reorder"] + KEEP + G128 + CLIP
     + ["--use_gptq", "--kv_cache"]),
    ("+clip", Q4 + ["--reorder"] + KEEP + G128 + CLIP + ["--no-kv_cache"]),
    ("+group128", Q4 + ["--reorder"] + KEEP + G128
     + ["--a_clip_ratio", "1.0", "--w_clip_ratio", "1.0", "--no-kv_cache"]),
    ("base_rtn", Q4 + ["--no-reorder", "--keeper", "0"] + NOG
     + ["--no-kv_cache"]),
    ("+reorder", Q4 + ["--reorder", "--keeper", "0"] + NOG
     + ["--no-kv_cache"]),
    ("+keeper_int8", Q4 + ["--reorder"] + KEEP + NOG + ["--no-kv_cache"]),
]


def main():
    with open(CSV, "w") as f:
        # fp16 is quantization-free — identical to the INT ladder's row
        f.write("fp16,targetResult,corpus,2.593714\n")
    for name, argv in RUNGS:
        run(f"fp4 {name}", BYTE + ["--eval_ppl"] + argv + FP,
            "targetResult,", CSV, f"{name},")
    print(open(CSV).read())


if __name__ == "__main__":
    main()
