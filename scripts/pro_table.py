"""Aggregate the PRO-grid sweep ledgers + artifacts into a markdown table.

Groups by (model, dataset, n_balls, num_inputs, varDT) over seeds; best-val
mean +- std (ddof=1) from the ledger, finite-rollout companions
(finite_fraction, test_loss_finite) from the npz artifacts — the same
seed aggregation the reference performs in test.ipynb cell 16 /
plotting.py:400-429, with the divergence-aware companions our artifacts add.

Usage: python scripts/pro_table.py [--outf results/pro]
"""

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np


def stem(c):
    from nonode_tpu.analysis.registry import artifact_stem
    return artifact_stem(c["model"], c["dataset"], c["seed"], c["n_balls"],
                         c["num_inputs"], varDT=c["varDT"])


import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nonode_tpu.analysis.results import short_horizon_loss  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outf", type=Path, default=Path("results/pro"))
    args = ap.parse_args()

    recs = []
    for ledger in sorted(args.outf.glob("sweep_*.jsonl")):
        recs += [json.loads(line) for line in ledger.read_text().splitlines()]

    groups = defaultdict(list)
    for r in recs:
        c = r["config"]
        art = args.outf / c.get("exp_name", "_exp_new") / (stem(c) + "_results.npz")
        ff = tlf = h16 = ff16 = float("nan")
        if art.exists():
            d = np.load(art, allow_pickle=True)
            ff = float(d["finite_fraction"])
            tlf = float(d["test_loss_finite"])
            h16, _, ff16 = short_horizon_loss(d)
        key = (c["model"], c["dataset"], c["n_balls"], c["num_inputs"],
               bool(c["varDT"]))
        groups[key].append(
            {"val": r["best_val_loss"], "test": r["test_loss"],
             "ff": ff, "tlf": tlf, "h16": h16, "ff16": ff16})

    print("| model | dataset | N | inputs | varDT | best val (mean±std) | "
          "finite frac | loss (finite, median) | loss@16 (median) | "
          "finite@16 |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for key in sorted(groups):
        g = groups[key]
        vals = np.array([x["val"] for x in g], dtype=float)
        ffs = np.array([x["ff"] for x in g], dtype=float)
        tlfs = np.array([x["tlf"] for x in g], dtype=float)
        h16s = np.array([x["h16"] for x in g], dtype=float)
        ff16s = np.array([x["ff16"] for x in g], dtype=float)
        m, dataset, n, ni, vdt = key
        std = np.std(vals, ddof=1) if len(vals) > 1 else 0.0
        print(f"| {m} | {dataset} | {n} | {ni} | {'T' if vdt else 'F'} "
              f"| {np.mean(vals):.4f} ± {std:.4f} "
              f"| {np.nanmean(ffs):.2f} | {np.nanmedian(tlfs):.3g} "
              f"| {np.nanmedian(h16s):.3g} | {np.nanmean(ff16s):.2f} |")


if __name__ == "__main__":
    main()
