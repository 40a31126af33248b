"""One-time transcription of published companion aggregates into the
committed snapshot (scripts/companion_snapshot.py format, kind="group").

The round-5 machine reset wiped EVERY rollout `.npz` artifact under
results/{base_ref,pro_ref} — including the 78 PRO cells and 60 BASE cells
whose `loss@20f` / `finite@20f` companions were computed in rounds 3-4 and
published in RESULTS.md (commits d4e5426/d1fc79b). Per-seed recomputation
is impossible without retraining ~35 h of cells, so this transcribes the
published GROUP-level aggregates (median loss@20f, mean finite@20f) into
``companions.jsonl`` group rows. compare_table consumes a group row only
when every per-seed value in the group is NaN, so freshly-retrained groups
(round 5 regenerates the 6 nan EGNO-gravity groups) always win.

Idempotent: re-running replaces the group rows it owns and leaves seed rows
untouched. Groups whose published companions are 'nan' are skipped.

Usage: python scripts/transcribe_r4_companions.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SECTIONS = {
    "## BASE grid at REFERENCE protocol": REPO / "results/base_ref",
    "## PRO grid at REFERENCE protocol": REPO / "results/pro_ref",
}
PROVENANCE = ("RESULTS.md round-3/4 table (commits d4e5426, d1fc79b): "
              "group aggregates computed from rollout artifacts that a "
              "2026-08-20 machine reset wiped before any per-seed snapshot "
              "existed")


def parse_section(text: str, heading: str) -> list[dict]:
    """Group rows from the first protocol-compare table after `heading`."""
    idx = text.index(heading)
    rows = []
    in_table = False
    for line in text[idx:].splitlines():
        if line.startswith("| model | dataset |"):
            in_table = True
            continue
        if in_table:
            if not line.startswith("|"):
                if rows:
                    break
                continue
            cells = [c.strip() for c in line.strip("|").split("|")]
            if cells[0] == "---" or len(cells) < 11:
                continue
            model, dataset, n, ni, vdt = cells[:5]
            h20, ff20 = cells[9], cells[10]
            if h20 == "nan" or ff20 == "nan":
                continue
            rows.append({
                "kind": "group",
                "key": [model, dataset, int(n), int(ni), vdt == "T"],
                "h20_med": float(h20), "ff20_mean": float(ff20),
                "provenance": PROVENANCE,
            })
    return rows


def merge(outf: Path, group_rows: list[dict]):
    path = outf / "companions.jsonl"
    seed_rows, old_groups = [], {}
    if path.exists():
        for line in path.read_text().splitlines():
            r = json.loads(line)
            if r.get("kind") == "group":
                old_groups[tuple(r["key"])] = r
            else:
                seed_rows.append(r)
    for r in group_rows:
        old_groups[tuple(r["key"])] = r
    tmp = path.with_suffix(".jsonl.tmp")
    tmp.write_text("".join(json.dumps(r) + "\n"
                           for r in seed_rows + list(old_groups.values())))
    os.replace(tmp, path)
    print(f"{outf}: {len(group_rows)} group rows transcribed "
          f"({len(seed_rows)} seed rows untouched)")


def main():
    text = (REPO / "RESULTS.md").read_text()
    for heading, outf in SECTIONS.items():
        merge(outf, parse_section(text, heading))


if __name__ == "__main__":
    main()
