"""Results registry — the experiment index layer.

Parity with artifact_model_map_complete.json + the aggregation cells of
test.ipynb: scan a results directory for run artifacts, group them by
configuration (model, dataset, n_balls, num_inputs, varDT, num_timesteps)
with seeds collected per group, and emit aggregated reports.

Run as a CLI:
    python -m nonode_tpu.analysis.registry --results results --out report
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

FNAME_RE = re.compile(
    r"(?P<model>EGNO|SEGNO)_(?P<dataset>\w+?)_seed=(?P<seed>\d+)"
    r"_n_part=(?P<n_balls>\d+)_n_inputs=(?P<num_inputs>\d+)"
    r"_dT_(?P<dT>\d+)_varDT=(?P<varDT>\w+)"
    r"_num_timesteps=(?P<num_timesteps>\d+)_results\.npz")


def scan_results(results_dir) -> dict:
    """Build {group_key: {seed: artifact_path}} from a results tree."""
    registry = {}
    for path in sorted(Path(results_dir).rglob("*_results.npz")):
        m = FNAME_RE.match(path.name)
        if not m:
            continue
        cfg = m.groupdict()
        seed = cfg.pop("seed")
        key = "_".join(f"{k}={cfg[k]}" for k in sorted(cfg))
        registry.setdefault(key, {})[seed] = str(path)
    return registry


def build_report(results_dir, out_dir=None):
    """Aggregate every seed group: mean/std curves, test losses, LaTeX table,
    and (optionally) figures."""
    from .results import analyze_group, latex_table, plot_multiple_curves

    registry = scan_results(results_dir)
    report = {}
    rows = []
    curves = {}
    for key, seeds in registry.items():
        agg = analyze_group(list(seeds.values()))
        report[key] = {
            "seeds": sorted(seeds),
            "test_loss_mean": agg["test_loss_mean"],
            "test_loss_std": agg["test_loss_std"],
            "mse_mean": agg["mse_mean"].tolist(),
            "mse_std": agg["mse_std"].tolist(),
            "corr_mean": agg["corr_mean"].tolist(),
            "energy_drift_mean": agg["energy_drift_mean"].tolist(),
        }
        rows.append((key.replace("_", " "), agg["test_loss_mean"],
                     agg["test_loss_std"]))
        curves[key] = (agg["mse_mean"], agg["mse_std"])

    out = {"registry": registry, "groups": report,
           "latex": latex_table(rows) if rows else ""}
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / "report.json", "w") as f:
            json.dump(out, f, indent=2)
        with open(out_dir / "table.tex", "w") as f:
            f.write(out["latex"])
        if curves:
            try:
                plot_multiple_curves(curves, out_dir / "mse_curves.png",
                                     ylabel="MSE per timestep")
            except Exception as e:  # matplotlib backends can be finicky
                print(f"plotting skipped: {e}")
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", type=str, default="results")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args(argv)
    out = build_report(args.results, args.out)
    for key, g in out["groups"].items():
        print(f"{key}: test_loss {g['test_loss_mean']:.5f} "
              f"± {g['test_loss_std']:.5f} (seeds: {','.join(g['seeds'])})")


if __name__ == "__main__":
    main()
