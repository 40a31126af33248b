"""bf16 shape-gap closure (VERDICT round-4 weak #1 / item 4).

The 2.1x bf16 throughput rows live at EGNO charged-20/B=512
(RESULTS.md roofline), but the round-4 trained-quality gate ran at
canonical charged-5. This runner trains 3-seed EGNO charged-20/B=512 at
the FULL reference protocol (epochs <= 1000, patience 15,
/root/reference/main.py:37-45) under BOTH precisions — the fp32 band and
the bf16 candidate at the exact shape the speed claim is made for — into
the resumable ledger results/bf16_quality/ledger_c20.jsonl (one row per
(precision, seed)).

Each run is a K=1 FLEET (nonode_tpu.fleet_main) rather than the
sequential driver: the axon tunnel wedged the sequential B=512 client
twice ~20 min into training on 2026-08-21, and the sequential path has no
mid-run resume — every retry restarted at epoch 0, so a recurring wedge
could never finish a 1000-epoch run. The fleet path checkpoints full
train state every 25 epochs and resumes bit-identically (the round-4
charged-20 BASE group regenerated digit-for-digit through exactly this
resume). --no_hbm_guard keeps the true B=512 (the K>=3 OOM heuristic
would scale it to 256+remat; the K=1 program is the same shape the
sequential driver and the bench roofline run in-memory fine). A K=1
fleet's train/eval math matches the sequential driver
(tests/test_driver.py fleet-vs-sequential equivalence).

Rows record wall_s of the completing attempt only; resumed attempts'
earlier wall time is visible in the chain log (fleet prints cumulative).

Usage: python scripts/r5_c20_quality.py [--seeds 1,2,3] [--precisions fp32,bf16]
Resumable: rows already in the ledger are skipped; killed runs resume
from the latest fleet checkpoint on the next invocation.
"""

import argparse
import json
import sys
import time
from pathlib import Path

# Line-buffer stdout under nohup: at B=512 the per-epoch prints otherwise
# sit in an 8 KB block buffer for >15 min, so the stall killer's
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

    from nonode_tpu.fleet_main import get_args as fleet_args, main as fleet_run

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
            rec = fleet_run(fleet_args([
                "--model", "egno", "--dataset", "charged", "--n_balls", "20",
                "--seeds", str(seed), "--precision", prec,
                "--epochs", "1000", "--batch_size", str(args.batch_size),
                "--checkpoint_every", "25", "--no_hbm_guard",
                "--data_dir", str(ROOT / "data"), "--outf", str(outf)]))[0]
            row = {"key": key, "model": "egno", "precision": prec,
                   "seed": seed, "batch_size": args.batch_size,
                   "best_val_loss": rec["best_val_loss"],
                   "best_epoch": rec["best_epoch"],
                   "test_loss": rec["test_loss"],
                   "finite_fraction": rec["finite_fraction"],
                   "test_loss_finite": rec["test_loss_finite"],
                   "wall_s": round(time.time() - t0, 1)}
            LEDGER.parent.mkdir(parents=True, exist_ok=True)
            with open(LEDGER, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"    best_val {row['best_val_loss']:.5f} "
                  f"best_epoch {row['best_epoch']} "
                  f"wall {row['wall_s']}s", flush=True)


if __name__ == "__main__":
    main()
