"""Aggregate the PRO-grid sweep ledgers + artifacts into a markdown table.

Groups by (model, dataset, n_balls, num_inputs, varDT) over seeds; best-val
mean +- std (ddof=1) from the ledger, finite-rollout companions
(finite_fraction, test_loss_finite) from the npz artifacts — the same
seed aggregation the reference performs in test.ipynb cell 16 /
plotting.py:400-429, with the divergence-aware companions our artifacts add.

Usage: python scripts/pro_table.py [--outf results/pro]
"""

import argparse
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nonode_tpu.analysis.ledger import load_ledger_groups, mean_std  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outf", type=Path, default=Path("results/pro"))
    args = ap.parse_args()

    groups = load_ledger_groups(args.outf)

    print("| model | dataset | N | inputs | varDT | best val (mean±std) | "
          "finite frac | loss (finite, median) | loss@20f (median) | "
          "finite@20f |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for key in sorted(groups):
        g = groups[key]
        ffs = np.array([x["ff"] for x in g], dtype=float)
        tlfs = np.array([x["tlf"] for x in g], dtype=float)
        h20s = np.array([x["h20"] for x in g], dtype=float)
        ff20s = np.array([x["ff20"] for x in g], dtype=float)
        m, dataset, n, ni, vdt = key
        print(f"| {m} | {dataset} | {n} | {ni} | {'T' if vdt else 'F'} "
              f"| {mean_std([x['val'] for x in g])} "
              f"| {np.nanmean(ffs):.2f} | {np.nanmedian(tlfs):.3g} "
              f"| {np.nanmedian(h20s):.3g} | {np.nanmean(ff20s):.2f} |")


if __name__ == "__main__":
    main()
