#!/usr/bin/env python
"""Single-process accuracy driver for the round-5 TPU queue.

Replaces queue stages 60-63 (fp16 cross-check, corpus-cloze zero-shot,
Mixtral INT-vs-FP4, FP4 ablation ladder) with ONE python process: the
tunneled TPU has repeatedly wedged for 25-45 min around client
disconnects, so every separate `python -m atom_tpu.main` invocation is a
wedge risk.  Runs in value order (cloze first — the north-star artifact),
appends results to the same CSVs the bash scripts produce, and survives
per-run failures.

    JAX_DEFAULT_MATMUL_PRECISION=highest python scripts/r5_acc_driver.py
"""
import contextlib
import io
import sys
import time
import traceback


class Tee(io.TextIOBase):
    def __init__(self, *sinks):
        self.sinks = sinks

    def write(self, s):
        for k in self.sinks:
            k.write(s)
            k.flush()
        return len(s)


def run(tag, argv, grep, outfile=None, prefix=""):
    """Run atom_tpu.main(argv) capturing stdout; append grep'd lines
    (prefixed) to outfile.  Returns the matched lines."""
    from atom_tpu.main import main

    print(f"=== {tag} ({time.strftime('%H:%M:%S')}) ===", flush=True)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(Tee(buf, sys.__stdout__)):
            main(argv)
    except SystemExit:
        pass
    except Exception:
        traceback.print_exc()
        print(f"=== {tag} FAILED ===", flush=True)
        return []
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith(grep)]
    if outfile:
        with open(outfile, "a") as f:
            for ln in lines:
                f.write(f"{prefix}{ln}\n")
    print(f"=== {tag} done: {lines} ===", flush=True)
    return lines


BYTE = ["byte-lm", "corpus", "--ckpt", "data/byte_lm_ckpt.npz",
        "--seqlen", "2048"]
W4A4 = ["--wbits", "4", "--abits", "4", "--reorder", "--keeper", "128",
        "--keeper_precision", "3", "--weight_group_size", "128",
        "--act_group_size", "128", "--a_clip_ratio", "0.9",
        "--w_clip_ratio", "0.85"]


def main():
    import os

    os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
    from atom_tpu.utils.compile_cache import enable

    enable()
    # ACC_PARTS: comma list of {fp16,cloze,mixtral,ladder}; default all.
    # Lets a CPU hedge run cloze+mixtral while the TPU queue owns the rest.
    parts = set(
        os.environ.get(
            "ACC_PARTS", "fp16,cloze,mixtral,ladder,intladder"
        ).split(",")
    )

    sfx = os.environ.get("ACC_SUFFIX", "")
    fp_csv = f"ablation_byte-lm_fp{sfx}.csv"

    # 1. fp16 rung — doubles as the CPU/TPU cross-device check
    if "fp16" in parts:
        open(fp_csv, "w").close()
        lines = run(
            "fp16 crosscheck",
            BYTE + ["--eval_ppl", "--wbits", "16", "--abits", "16",
                    "--no-reorder", "--keeper", "0", "--no-kv_cache"],
            "targetResult,", fp_csv, "fp16,",
        )
        if lines:
            tpu_ppl = float(lines[0].split(",")[-1])
            print(f"cross-device: TPU fp16 {tpu_ppl:.6f} vs CPU 2.593714 "
                  f"(delta {tpu_ppl - 2.593714:+.6f})", flush=True)

    # 2. zero-shot corpus cloze (north-star artifact #1)
    if "cloze" in parts:
        zs_csv = f"zeroshot_byte-lm{sfx}.csv"
        zs = open(zs_csv, "w")
        zs.write("task,config,acc\n")
        zs.close()
        for cfg, argv in (
            ("fp16", ["--wbits", "16", "--abits", "16", "--no-reorder",
                      "--keeper", "0", "--calib_samples", "2"]),
            ("w4a4", W4A4 + ["--use_gptq"]),
        ):
            lines = run(
                f"cloze {cfg}",
                BYTE + ["--eval_common_sense", "--zs_tasks", "corpus_cloze",
                        "--zs_limit", "256"]
                + argv,
                "INFO corpus_cloze :",
            )
            with open(zs_csv, "a") as f:
                for ln in lines:
                    f.write(ln.replace("INFO ", f"{cfg},") + "\n")

    # 3. Mixtral INT4 vs FP4 delta (north-star config 5, accuracy half)
    mx_csv = f"ablation_fp4-vs-int4{sfx}.csv"
    MX = ["tiny-mixtral", "synthetic", "--eval_ppl", "--seqlen", "512",
          "--calib_samples", "2"]
    MXQ = W4A4 + ["--weight_channel_group", "2", "--kv_cache", "--use_gptq"]
    if "mixtral" in parts:
        open(mx_csv, "w").close()
        run("mixtral int4", MX + MXQ + ["--quant_type", "int"],
            "targetResult,", mx_csv, "mixtral-int4,")
        run("mixtral fp4", MX + MXQ + ["--quant_type", "fp"],
            "targetResult,", mx_csv, "mixtral-fp4,")
        run("mixtral fp16",
            MX + ["--wbits", "16", "--abits", "16", "--no-reorder",
                  "--keeper", "0", "--no-kv_cache"],
            "targetResult,", mx_csv, "mixtral-fp16,")

    if "ladder" not in parts:
        print("=== acc driver complete (parts: %s) ===" % parts, flush=True)
        return

    # 4. FP4 ladder rungs 2-8 (run_atom_ablation.sh flags, QTYPE=fp)
    FP = ["--quant_type", "fp"]
    Q4 = ["--wbits", "4", "--abits", "4"]
    NOG = ["--weight_group_size", "0", "--act_group_size", "0",
           "--a_clip_ratio", "1.0", "--w_clip_ratio", "1.0"]
    G128 = ["--weight_group_size", "128", "--act_group_size", "128"]
    CLIP = ["--a_clip_ratio", "0.9", "--w_clip_ratio", "0.85"]
    KEEP = ["--keeper", "128", "--keeper_precision", "3"]
    rungs = [
        ("base_rtn", Q4 + ["--no-reorder", "--keeper", "0"] + NOG
         + ["--no-kv_cache"]),
        ("+reorder", Q4 + ["--reorder", "--keeper", "0"] + NOG
         + ["--no-kv_cache"]),
        ("+keeper_int8", Q4 + ["--reorder"] + KEEP + NOG
         + ["--no-kv_cache"]),
        ("+group128", Q4 + ["--reorder"] + KEEP + G128
         + ["--a_clip_ratio", "1.0", "--w_clip_ratio", "1.0",
            "--no-kv_cache"]),
        ("+clip", Q4 + ["--reorder"] + KEEP + G128 + CLIP
         + ["--no-kv_cache"]),
        ("+gptq", Q4 + ["--reorder"] + KEEP + G128 + CLIP
         + ["--use_gptq", "--no-kv_cache"]),
        ("+kv_cache", Q4 + ["--reorder"] + KEEP + G128 + CLIP
         + ["--use_gptq", "--kv_cache"]),
    ]
    for name, argv in rungs:
        run(f"fp4 ladder {name}", BYTE + ["--eval_ppl"] + argv + FP,
            "targetResult,", fp_csv, f"{name},")

    # 5. INT ladder on the SAME checkpoint (round 5: the machine reset
    # destroyed the gitignored round-4 ckpt, so the committed CPU INT
    # ladder's checkpoint is gone; re-running both ladders here keeps the
    # INT-vs-FP comparison internally consistent on the retrained ckpt).
    int_csv = f"ablation_byte-lm_int{sfx}.csv"
    if "intladder" in parts:
        open(int_csv, "w").close()
        run("int fp16", BYTE + ["--eval_ppl", "--wbits", "16", "--abits",
                                "16", "--no-reorder", "--keeper", "0",
                                "--no-kv_cache"],
            "targetResult,", int_csv, "fp16,")
        for name, argv in rungs:
            run(f"int ladder {name}", BYTE + ["--eval_ppl"] + argv,
                "targetResult,", int_csv, f"{name},")

    print("=== acc driver complete ===", flush=True)
    for f in (fp_csv, f"zeroshot_byte-lm{sfx}.csv", mx_csv, int_csv):
        if os.path.exists(f):
            print(f"--- {f}")
            print(open(f).read())


if __name__ == "__main__":
    main()
