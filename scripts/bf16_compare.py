"""Compare bf16 speed-mode trained quality against the fp32 seed bands.

VERDICT round-3 item 4: the 2.1x bf16 rows were step timings only; this
script turns the trained evidence (results/bf16_quality/ledger.jsonl,
3-seed fleets at the full reference protocol) into the RESULTS.md verdict
by placing each bf16 seed against the fp32 reference-protocol band
(results/base_ref/sweep_BASE.jsonl, 5-seed fleets, same code path).

Reference numerics bar: the reference pins its spectral conv to fp32 even
under autocast (/root/reference/EGNO/model/layer_no.py:100-108) — our bf16
mode keeps that pin (ops/spectral.py), so the comparison isolates the
matmul/elementwise precision drop.

Usage: python scripts/bf16_compare.py [--bf16 ledger] [--fp32 ledger]
Prints a markdown table + verdict paragraph ready for RESULTS.md.
"""
import argparse
import json
import math
import statistics
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def fp32_band(ledger, model):
    rows = [json.loads(l) for l in Path(ledger).read_text().splitlines()]
    rows = [r for r in rows
            if r["config"]["model"] == model
            and r["config"]["dataset"] == "charged"
            and r["config"]["n_balls"] == 5]
    return rows


def c20_summary(ledger):
    """Markdown block for the charged-20/B=512 shape-gap ledger
    (scripts/r5_c20_quality.py: flat rows, one per (precision, seed), BOTH
    precisions freshly trained at the reference protocol — the shape the
    2.1x throughput row is measured at)."""
    rows = [json.loads(l) for l in Path(ledger).read_text().splitlines()]
    by = {}
    for r in rows:
        by.setdefault(r["precision"], []).append(r)
    lines = ["| precision | best val (mean±std) | per-seed best val "
             "| best_epoch (med) | finite frac | wall_s (mean) |",
             "|---|---|---|---|---|---|"]
    means = {}
    for prec in ("fp32", "bf16"):
        rs = sorted(by.get(prec, []), key=lambda r: r["seed"])
        if not rs:
            lines.append(f"| {prec} | _no rows yet_ | | | | |")
            continue
        bv = [r["best_val_loss"] for r in rs]
        fin = [x for x in bv if math.isfinite(x)]
        means[prec] = statistics.mean(fin) if fin else float("nan")
        sd = statistics.stdev(fin) if len(fin) > 1 else 0.0
        epochs = sorted(r["best_epoch"] for r in rs)
        ff = [r["finite_fraction"] for r in rs]
        wall = statistics.mean(r["wall_s"] for r in rs)
        lines.append(
            f"| {prec} | {means[prec]:.4f} ± {sd:.4f} | "
            + ", ".join("NaN" if not math.isfinite(x) else f"{x:.4f}"
                        for x in bv)
            + f" | {epochs[len(epochs) // 2]} | "
            + ", ".join(f"{x:.2f}" for x in ff)
            + f" | {wall:.0f} |")
    print("\n".join(lines))
    if "fp32" in means and "bf16" in means:
        fp32_vals = [r["best_val_loss"] for r in by["fp32"]
                     if math.isfinite(r["best_val_loss"])]
        bf16_vals = [r["best_val_loss"] for r in by["bf16"]
                     if math.isfinite(r["best_val_loss"])]
        in_band = sum(min(fp32_vals) <= x <= max(fp32_vals)
                      for x in bf16_vals)
        print(f"\nbf16/fp32 best-val mean ratio {means['bf16'] / means['fp32']:.3f}; "
              f"{in_band}/{len(bf16_vals)} bf16 seeds inside the fp32 "
              f"min-max band; NaN seeds fp32:"
              f"{len(by['fp32']) - len(fp32_vals)} bf16:"
              f"{len(by['bf16']) - len(bf16_vals)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", default=ROOT / "results/bf16_quality/ledger.jsonl")
    ap.add_argument("--fp32", default=ROOT / "results/base_ref/sweep_BASE.jsonl")
    ap.add_argument("--c20", action="store_true",
                    help="summarize the charged-20/B=512 shape-gap ledger "
                    "(results/bf16_quality/ledger_c20.jsonl) instead")
    args = ap.parse_args()
    if args.c20:
        c20_summary(ROOT / "results/bf16_quality/ledger_c20.jsonl")
        return

    bf16_rows = [json.loads(l) for l in Path(args.bf16).read_text().splitlines()]
    lines = []
    verdicts = []
    lines.append("| model | metric | fp32 band (min..max, finite seeds) | fp32 mean±std "
                 "| bf16 seeds | bf16 mean | bf16/fp32 |")
    lines.append("|---|---|---|---|---|---|---|")
    # best_val_loss is the primary quality anchor: at the full reference
    # protocol the EGNO charged-5 rollouts mostly diverge past the bound
    # (test_loss NaN — documented in RESULTS.md), identically for both
    # precisions, so the rollout columns carry finite_fraction context.
    for rec in bf16_rows:
        model = rec["model"]
        fp32 = fp32_band(args.fp32, model)
        if not fp32:
            print(f"no fp32 rows for {model} — skip")
            continue
        for metric in ("best_val_loss", "test_loss_finite", "finite_fraction"):
            f = [r[metric] for r in fp32 if math.isfinite(r[metric])]
            b = [r[metric] for r in rec["records"] if math.isfinite(r[metric])]
            nf = len(fp32) - len(f)
            nb = len(rec["records"]) - len(b)
            if not f or not b:
                lines.append(f"| {model} | {metric} | all-NaN fp32:{nf} bf16:{nb} "
                             "| — | — | — | — |")
                continue
            fm, bm = statistics.mean(f), statistics.mean(b)
            fs = statistics.stdev(f) if len(f) > 1 else 0.0
            in_band = sum(min(f) <= x <= max(f) for x in b)
            drop = f" (NaN dropped fp32:{nf} bf16:{nb})" if nf or nb else ""
            lines.append(
                f"| {model} | {metric}{drop} | {min(f):.4f}..{max(f):.4f} | "
                f"{fm:.4f}±{fs:.4f} | "
                + ", ".join(f"{x:.4f}" for x in b)
                + f" | {bm:.4f} | {bm/fm:.3f} |")
            if metric == "best_val_loss":
                verdicts.append((model, metric, bm / fm, in_band, len(b)))
    print("\n".join(lines))
    print()
    for model, metric, ratio, in_band, n in verdicts:
        print(f"{model} {metric}: bf16/fp32 mean ratio {ratio:.3f}, "
              f"{in_band}/{n} bf16 seeds inside the fp32 min-max band")
    if verdicts:
        worst = max(verdicts, key=lambda v: v[2])
        print(f"\nworst best-val ratio: {worst[0]} {worst[2]:.3f}")


if __name__ == "__main__":
    main()
