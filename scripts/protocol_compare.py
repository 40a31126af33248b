"""Join the 300-epoch and reference-protocol sweep ledgers into one table.

The reference sweep protocol is epochs<=1000 with patience-15 early stopping
(/root/reference/main.py:37-45; _schedule.yaml pins no epochs). The round-2
grids truncated at 300 epochs; the round-3 rerun (results/{base_ref,pro_ref})
restores the reference protocol. This script emits the side-by-side section
for RESULTS.md: per group, best-val mean+-std under both protocols, the
median best_epoch under the reference protocol (how many cells actually
needed >300 epochs), and the loss@20-frames headline under the reference
protocol.

Usage:
  python scripts/protocol_compare.py --short results/base --ref results/base_ref
  python scripts/protocol_compare.py --short results/pro  --ref results/pro_ref

compare_table() is the importable core (scripts/make_report.py reuses it so
docs/REPORT.md and RESULTS.md render from one implementation).
"""

import argparse
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nonode_tpu.analysis.ledger import (  # noqa: E402
    load_companions, load_ledger_groups, mean_std)


def compare_table(short_dir, ref_dir):
    """Markdown-table lines + the unconverged-cell tally sentence."""
    short, ref = load_ledger_groups(short_dir), load_ledger_groups(ref_dir)
    _, group_snap = load_companions(ref_dir)
    keys = sorted(ref)  # the ref rerun defines the rows (PRO_HEADLINE subset)

    lines = [
        "| model | dataset | N | inputs | varDT | best val «300ep» | "
        "best val «ref» | Δ | best_epoch «ref» (med [min-max]) | "
        "loss@20f «ref» (med) | finite@20f |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    n_late = n_cells = 0
    for key in keys:
        g_ref = ref[key]
        g_short = short.get(key, [])
        m, dataset, n, ni, vdt = key
        vals_ref = np.array([x["val"] for x in g_ref], dtype=float)
        epochs = np.array([x["best_epoch"] for x in g_ref], dtype=float)
        h20s = np.array([x["h20"] for x in g_ref], dtype=float)
        ff20s = np.array([x["ff20"] for x in g_ref], dtype=float)
        # Under reference-faithful NaN semantics (EGNO/utils.py:261-268: a
        # NaN val lands in the improvement branch, overwrites the
        # checkpoint, and never early-stops) a destabilized seed ends the
        # protocol with best_val = NaN and best_epoch = last epoch. Report
        # the group as finite-seed stats + an explicit NaN-seed count
        # rather than letting one NaN erase the group column.
        fin = np.isfinite(vals_ref)
        n_nan = int((~fin).sum())
        # unconverged tally over FINITE seeds only: a NaN seed ends at the
        # last epoch by construction (never stops), which says nothing
        # about convergence under the truncation
        n_late += int((epochs[fin] >= 300).sum())
        n_cells += int(fin.sum())
        val_txt = mean_std(vals_ref[fin]) if fin.any() else "NaN"
        if n_nan:
            val_txt += f" ({fin.sum()}/{len(fin)} fin)"
        ep_fin = epochs[fin] if fin.any() else epochs
        delta = ""
        if g_short and fin.any():
            vs = np.mean([x["val"] for x in g_short])
            delta = f"{(np.mean(vals_ref[fin]) - vs) / vs * 100:+.0f}%"
        # companion columns: per-seed values (live artifact or committed
        # per-seed snapshot); when the whole group predates any per-seed
        # snapshot (reset-wiped artifacts), fall back to the committed
        # group-level transcription of the previously-published aggregate
        h20_txt = f"{np.nanmedian(h20s):.3g}" if np.isfinite(h20s).any() \
            else "nan"
        ff20_txt = f"{np.nanmean(ff20s):.2f}" if np.isfinite(ff20s).any() \
            else "nan"
        if not np.isfinite(h20s).any() and key in group_snap:
            g = group_snap[key]
            h20_txt = f"{g['h20_med']:.3g}"
            ff20_txt = f"{g['ff20_mean']:.2f}"
        lines.append(
            f"| {m} | {dataset} | {n} | {ni} | {'T' if vdt else 'F'} "
            f"| {mean_std([x['val'] for x in g_short]) if g_short else '—'} "
            f"| {val_txt} | {delta} "
            f"| {int(np.median(ep_fin))} [{int(ep_fin.min())}-"
            f"{int(ep_fin.max())}] "
            f"| {h20_txt} | {ff20_txt} |")
    tally = (f"{n_late}/{n_cells} reference-protocol cells reached their "
             f"best validation at epoch ≥ 300, i.e. were structurally "
             f"unconverged under the 300-epoch truncation.")
    return lines, tally


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=Path, required=True,
                    help="300-epoch ledger dir")
    ap.add_argument("--ref", type=Path, required=True,
                    help="reference-protocol ledger dir")
    args = ap.parse_args()

    lines, tally = compare_table(args.short, args.ref)
    print("\n".join(lines))
    print(f"\n{tally}")


if __name__ == "__main__":
    main()
