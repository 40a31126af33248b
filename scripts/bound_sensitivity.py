"""Sensitivity of the divergence bound behind finite-fraction metrics.

The "converged rollout" heuristic (train/loop.py _finite_metrics,
analysis/results.py short_horizon_loss) counts a sample as finite when its
whole predicted horizon stays within `mult` x the ground-truth coordinate
range (default 10x). The published `finite frac` / `finite@20f` / `loss@20f`
columns inherit that choice. This script recomputes them at mult in
{3, 10, 30} over every artifact a results tree's ledgers point to, so the
RESULTS.md robustness note is a measurement, not an assertion.

Usage: python scripts/bound_sensitivity.py --outf results/pro_ref \
           [--outf results/base_ref ...] [--json results/bound_sensitivity.json]
"""

import argparse
import json
from collections import defaultdict
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nonode_tpu.analysis.ledger import iter_ledger_artifacts  # noqa: E402
from nonode_tpu.analysis.results import short_horizon_loss  # noqa: E402

MULTS = (3.0, 10.0, 30.0)


def full_horizon_finite(d, mult):
    """finite_fraction over the stored horizon at an alternative bound
    (the _finite_metrics rule recomputed from the artifact)."""
    preds = np.asarray(d["preds"])
    targets = np.asarray(d["targets"])[:, : preds.shape[1]]
    bound = mult * max(float(np.abs(targets).max()), 1.0)
    with np.errstate(invalid="ignore", over="ignore"):
        ok = (np.isfinite(preds)
              & (np.abs(preds) <= bound)).all(axis=tuple(range(1, preds.ndim)))
    return float(ok.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outf", type=Path, action="append", required=True)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()

    groups = defaultdict(list)
    n_missing = 0
    for outf in args.outf:
        for r, c, art in iter_ledger_artifacts(outf):
            if art is None:
                n_missing += 1
                continue
            d = np.load(art, allow_pickle=True)
            fpe = 1 if c["model"] == "egno" else int(
                c.get("num_timesteps", 10))
            row = {}
            for m in MULTS:
                h20, _, ff20 = short_horizon_loss(d, frames_per_entry=fpe,
                                                  bound_mult=m)
                row[m] = {"ff_full": full_horizon_finite(d, m),
                          "ff20": ff20, "h20": h20}
            key = (c["model"], c["dataset"], c["n_balls"],
                   c.get("num_inputs", 1), bool(c.get("varDT", False)))
            groups[key].append(row)

    print(f"# Divergence-bound sensitivity ({len(groups)} groups, "
          f"{sum(len(v) for v in groups.values())} artifacts, "
          f"{n_missing} ledger rows without artifacts)")
    print("| model | dataset | N | in | varDT | "
          + " | ".join(f"finite@{int(m)}x" for m in MULTS) + " | "
          + " | ".join(f"ff20@{int(m)}x" for m in MULTS) + " | "
          + " | ".join(f"loss20@{int(m)}x" for m in MULTS) + " |")
    print("|---" * (5 + 3 * len(MULTS)) + "|")
    out = {}
    max_ff_delta = max_ff20_delta = 0.0
    for key in sorted(groups, key=str):
        g = groups[key]
        cells = {m: {k: float(np.nanmean([row[m][k] for row in g]))
                     for k in ("ff_full", "ff20")} for m in MULTS}
        for m in MULTS:
            cells[m]["h20"] = float(np.nanmedian([row[m]["h20"] for row in g]))
        mdl, ds_, n, ni, v = key
        print(f"| {mdl} | {ds_} | {n} | {ni} | {'T' if v else 'F'} | "
              + " | ".join(f"{cells[m]['ff_full']:.2f}" for m in MULTS) + " | "
              + " | ".join(f"{cells[m]['ff20']:.2f}" for m in MULTS) + " | "
              + " | ".join(f"{cells[m]['h20']:.3g}" for m in MULTS) + " |")
        out["/".join(map(str, key))] = {str(int(m)): cells[m] for m in MULTS}
        max_ff_delta = max(max_ff_delta,
                           abs(cells[3.0]["ff_full"] - cells[30.0]["ff_full"]))
        max_ff20_delta = max(max_ff20_delta,
                             abs(cells[3.0]["ff20"] - cells[30.0]["ff20"]))
    print(f"\nmax |finite(3x) - finite(30x)| over groups: {max_ff_delta:.3f}")
    print(f"max |finite@20f(3x) - finite@20f(30x)|:      {max_ff20_delta:.3f}")
    if args.json:
        args.json.parent.mkdir(parents=True, exist_ok=True)
        args.json.write_text(json.dumps(
            {"groups": out, "max_ff_delta": max_ff_delta,
             "max_ff20_delta": max_ff20_delta}, indent=2))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
