"""Render results/bench_full.json into the RESULTS.md perf tables.

Two tables: the wall-clock reproduction rows (datagen / SEGNO step / rollout
eval / fleet / 1000-body Pallas) and the ROOFLINE rows (compute-bound shapes
with achieved TFLOP/s and MFU against both the dense bf16 peak and the
fp32-HIGHEST-adjusted peak — see bench.py:bench_compute_bound).

Usage: python scripts/bench_table.py [results/bench_full.json]
"""

import json
import sys
from pathlib import Path

def _pct(x):
    return f"{x * 100:.2f}%" if x is not None else "n/a"


def main():
    repo = Path(__file__).resolve().parent.parent
    path = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        repo / "results" / "bench_full.json")
    rows = json.loads(path.read_text())
    by_metric = {r["metric"]: r for r in rows}

    print("## Wall-clock rows (bench.py --full)\n")
    print("| metric | value | unit | detail |")
    print("|---|---|---|---|")
    for r in rows:
        if r["metric"].startswith("roofline_"):
            continue
        if "error" in r:
            print(f"| {r['metric']} | ERROR | — | {r['error']} |")
            continue
        detail = ", ".join(
            f"{k}={v}" for k, v in r.items()
            if k not in ("metric", "value", "unit") and v is not None)
        print(f"| {r['metric']} | {r['value']} | {r['unit']} | {detail} |")

    print("\n## Roofline (compute-bound shapes, MFU scaling)\n")
    print("| shape | samples/s | step ms | achieved TFLOP/s | "
          "MFU vs bf16 peak | MFU vs fp32-HIGHEST peak |")
    print("|---|---|---|---|---|---|")
    order = ["egno_train_throughput", "roofline_egno_charged20_B512",
             "roofline_egno_gravity100_B64", "roofline_egno_charged5_h256_B512",
             "roofline_egno_charged20_B512_bf16",
             "roofline_egno_charged5_h256_B512_bf16"]
    for m in order:
        r = by_metric.get(m)
        if r is None:
            continue
        if "error" in r:
            print(f"| {m} | ERROR: {r['error']} | | | | |")
            continue
        if m == "egno_train_throughput":  # headline row for context
            mfu = r.get("mfu")
            tf = r["flops_per_step"] / (r["step_ms"] / 1e3) / 1e12
            # fp32-HIGHEST pass factor, taken from any roofline row that
            # carries both peaks (single source of truth: bench.py)
            factor = next(
                (x["mfu_fp32_highest_peak"] / x["mfu_bf16_peak"]
                 for x in rows if x.get("mfu_bf16_peak")
                 and x.get("mfu_fp32_highest_peak")), None)
            mfu_adj = mfu * factor if (mfu is not None and factor) else None
            print(f"| canonical charged5_B256 (headline) | {r['value']} "
                  f"| {r['step_ms']:.3f} | {tf:.3f} "
                  f"| {_pct(mfu)} | {_pct(mfu_adj)} |")
            continue
        name = m.removeprefix("roofline_egno_")
        print(f"| {name} | {r['value']} | {r['step_ms']} "
              f"| {r['achieved_tflops']} "
              f"| {_pct(r.get('mfu_bf16_peak'))} "
              f"| {_pct(r.get('mfu_fp32_highest_peak'))} |")


if __name__ == "__main__":
    main()
