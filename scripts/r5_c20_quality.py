"""bf16 shape-gap closure (VERDICT round-4 weak #1 / item 4).

The 2.1x bf16 throughput rows live at EGNO charged-20/B=512
(RESULTS.md roofline), but the round-4 trained-quality gate ran at
canonical charged-5. This runner trains 3-seed EGNO charged-20/B=512 at
the FULL reference protocol (epochs <= 1000, patience 15,
/root/reference/main.py:37-45) under BOTH precisions — the fp32 band and
the bf16 candidate at the exact shape the speed claim is made for — into
the resumable ledger results/bf16_quality/ledger_c20.jsonl (one row per
seed, same artifact-backed fields as the charged-5 ledger).

Sequential driver (not fleet): a 3-seed N=20 fleet trips the HBM guard
down to B=32+remat, which would validate quality at a different batch
than the B=512 claim. Sequential runs hold B=512 on one chip.

Usage: python scripts/r5_c20_quality.py [--seeds 1,2,3] [--precisions fp32,bf16]
Resumable: rows already in the ledger are skipped.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# Line-buffer stdout under nohup: at B=512 the driver's per-epoch prints
# otherwise sit in an 8 KB block buffer for >15 min, so the stall killer's
# log-growth test is permanently failed and only the CPU-rate test
# separates a healthy run from a wedge.
sys.stdout.reconfigure(line_buffering=True)

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

LEDGER = ROOT / "results/bf16_quality/ledger_c20.jsonl"


def done_keys():
    if not LEDGER.exists():
        return set()
    return {json.loads(l)["key"] for l in LEDGER.read_text().splitlines()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="1,2,3")
    ap.add_argument("--precisions", default="fp32,bf16")
    ap.add_argument("--batch_size", type=int, default=512)
    args = ap.parse_args()

    from nonode_tpu.analysis.registry import artifact_stem
    from nonode_tpu.main import get_args, main as run_main

    done = done_keys()
    for prec in args.precisions.split(","):
        for seed in [int(s) for s in args.seeds.split(",")]:
            key = f"egno/charged/20/B={args.batch_size}/seed{seed}/{prec}"
            if key in done:
                print(f"[skip] {key}")
                continue
            outf = ROOT / "results/bf16_quality" / f"c20_{prec}"
            print(f"=== {key} ===", flush=True)
            t0 = time.time()
            run_args = get_args([
                "--model", "egno", "--dataset", "charged", "--n_balls", "20",
                "--seed", str(seed), "--precision", prec,
                "--epochs", "1000", "--batch_size", str(args.batch_size),
                "--data_dir", str(ROOT / "data"), "--outf", str(outf)])
            best_val, test_loss, best_epoch = run_main(run_args)
            stem = artifact_stem("egno", "charged", seed, 20)
            art = np.load(outf / "0exp_new" / f"{stem}_results.npz",
                          allow_pickle=True)
            row = {"key": key, "model": "egno", "precision": prec,
                   "seed": seed, "batch_size": args.batch_size,
                   "best_val_loss": float(best_val),
                   "best_epoch": int(best_epoch),
                   "test_loss": float(test_loss),
                   "finite_fraction": float(art["finite_fraction"]),
                   "test_loss_finite": float(art["test_loss_finite"]),
                   "wall_s": round(time.time() - t0, 1)}
            LEDGER.parent.mkdir(parents=True, exist_ok=True)
            with open(LEDGER, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"    best_val {best_val:.5f} best_epoch {best_epoch} "
                  f"wall {row['wall_s']}s", flush=True)


if __name__ == "__main__":
    main()
