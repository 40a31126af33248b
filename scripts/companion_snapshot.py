"""Persist artifact-derived companion metrics into a committed snapshot.

The RESULTS.md table columns `finite frac` / `loss (finite)` / `loss@20f` /
`finite@20f` are computed from rollout `.npz` artifacts (analysis/ledger.py),
but the artifacts are gitignored (hundreds of MB) and machine resets have
wiped them twice (round 4: 18 cells; round 5: the entire tree). This tool
walks every `sweep_*.jsonl` ledger row in an outf directory, computes the
companions for every artifact still on disk, and merges them into
``<outf>/companions.jsonl`` — a small committed sidecar the ledger loader
falls back to when the artifact is gone. Rows whose artifacts are missing
keep their previously-snapshotted entry.

Two row kinds (see analysis/ledger.py `load_companions`):
  {"kind": "seed",  "config_id": ..., "ff", "tlf", "h20", "ff20", ...}
  {"kind": "group", "key": [model, dataset, n, inputs, varDT],
   "h20_med", "ff20_mean", "provenance": ...}
Seed rows are written by this tool from live artifacts; group rows are
transcriptions of previously-published aggregates for cells whose artifacts
were reset-wiped before any per-seed snapshot existed (round-4 table,
commit d1fc79b) — compare_table uses them only when every per-seed value in
the group is NaN.

Usage: python scripts/companion_snapshot.py OUTF [OUTF ...]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nonode_tpu.analysis.ledger import iter_ledger_artifacts  # noqa: E402
from nonode_tpu.analysis.results import short_horizon_loss  # noqa: E402


def snapshot(outf: Path) -> tuple[int, int]:
    """Merge fresh per-seed companion rows into <outf>/companions.jsonl.
    Returns (n_fresh, n_total)."""
    path = Path(outf) / "companions.jsonl"
    rows: dict = {}
    group_rows: list = []
    if path.exists():
        for line in path.read_text().splitlines():
            r = json.loads(line)
            if r.get("kind") == "group":
                group_rows.append(r)
            else:
                rows[r["config_id"]] = r
    fresh = 0
    for rec, c, art in iter_ledger_artifacts(outf):
        if art is None:
            continue
        d = np.load(art, allow_pickle=True)
        num_timesteps = int(c.get("num_timesteps", 10))
        fpe = 1 if c["model"] == "egno" else num_timesteps
        h20, _, ff20 = short_horizon_loss(d, frames_per_entry=fpe)
        rows[rec["config_id"]] = {
            "kind": "seed", "config_id": rec["config_id"],
            "ff": (float(d["finite_fraction"])
                   if "finite_fraction" in d.files else float("nan")),
            "tlf": (float(d["test_loss_finite"])
                    if "test_loss_finite" in d.files else float("nan")),
            "h20": float(h20), "ff20": float(ff20),
        }
        fresh += 1
    tmp = path.with_suffix(".jsonl.tmp")
    tmp.write_text("".join(
        json.dumps(r) + "\n"
        for r in list(rows.values()) + group_rows))
    os.replace(tmp, path)
    return fresh, len(rows) + len(group_rows)


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    for outf in sys.argv[1:]:
        fresh, total = snapshot(Path(outf))
        print(f"{outf}: {fresh} companions recomputed from live artifacts, "
              f"{total} rows in companions.jsonl")


if __name__ == "__main__":
    main()
