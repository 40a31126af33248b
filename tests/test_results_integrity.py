"""Integrity of the COMMITTED results ledgers/snapshots.

The protocol tables regenerate from these files alone (RESULTS.md,
docs/REPORT.md); a corrupted ledger or a snapshot row that drifted off the
grid would silently skew published groups. These checks hold at any point
of a resumable regeneration (no row-count assertions beyond the schedule
bound), so they stay green mid-chain.
"""

import json
from pathlib import Path

import pytest

from nonode_tpu.parallel.sweep import DEFAULT_SCHEDULE, config_id, expand_grid

REPO = Path(__file__).resolve().parent.parent


def _ledger_rows(path):
    return [json.loads(l) for l in path.read_text().splitlines()]


class TestCommittedLedgers:
    @pytest.mark.parametrize("ledger,grid", [
        ("results/pro_ref/sweep_PRO.jsonl", "PRO"),
        ("results/base_ref/sweep_BASE.jsonl", "BASE"),
    ])
    def test_rows_unique_and_on_grid(self, ledger, grid):
        path = REPO / ledger
        if not path.exists():
            pytest.skip(f"{ledger} absent in this checkout")
        rows = _ledger_rows(path)
        ids = [r["config_id"] for r in rows]
        assert len(ids) == len(set(ids)), "duplicate config_id in ledger"
        grid_ids = {config_id(c) for c in expand_grid(DEFAULT_SCHEDULE[grid])}
        off_grid = set(ids) - grid_ids
        assert not off_grid, f"ledger rows off the reference grid: {off_grid}"
        assert len(ids) <= len(grid_ids)
        for r in rows:
            assert isinstance(r["best_val_loss"], float)
            assert "best_epoch" in r

    @pytest.mark.parametrize("outf,grid", [
        ("results/pro_ref", "PRO"),
        ("results/base_ref", "BASE"),
    ])
    def test_companion_snapshot_on_grid(self, outf, grid):
        path = REPO / outf / "companions.jsonl"
        if not path.exists():
            pytest.skip("no snapshot in this checkout")
        grid_cfgs = expand_grid(DEFAULT_SCHEDULE[grid])
        grid_ids = {config_id(c) for c in grid_cfgs}
        grid_keys = {(c["model"], c["dataset"], c["n_balls"],
                      c["num_inputs"], bool(c["varDT"])) for c in grid_cfgs}
        seen_groups = set()
        for r in _ledger_rows(path):
            if r.get("kind") == "group":
                key = tuple(r["key"])
                assert key in grid_keys, f"group row off grid: {key}"
                assert key not in seen_groups, f"duplicate group row: {key}"
                seen_groups.add(key)
                assert r["h20_med"] == r["h20_med"], "NaN transcribed"
                assert 0.0 <= r["ff20_mean"] <= 1.0
                assert "provenance" in r
            else:
                assert r["config_id"] in grid_ids
                for k in ("ff", "tlf", "h20", "ff20"):
                    assert k in r
