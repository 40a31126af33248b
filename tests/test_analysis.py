"""Analysis + sweep layer tests."""

import json

import numpy as np
import pytest

from nonode_tpu.analysis.results import (analyze_group, avg_loss_until_corr,
                                         correlation_per_timestep,
                                         energy_drift_per_timestep,
                                         latex_table, load_artifact,
                                         mean_std_over_seeds,
                                         mse_per_timestep,
                                         short_horizon_loss)
from nonode_tpu.parallel.sweep import (DEFAULT_SCHEDULE, config_id,
                                       expand_grid, summarize)


@pytest.fixture
def artifacts(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for seed in range(3):
        targets = rng.randn(16, 20, 5, 3).astype(np.float32)
        preds = (targets[:, :8]
                 + 0.1 * rng.randn(16, 8, 5, 3)).astype(np.float32)
        energy = 2.0 + 0.01 * rng.randn(16, 8, 1)
        p = tmp_path / f"seed{seed}_results.npz"
        np.savez(p, targets=targets, preds=preds,
                 energy_conservation=energy, test_loss=0.1 * (seed + 1))
        paths.append(p)
    return paths


class TestAnalysis:
    def test_mse_per_timestep(self):
        t = np.zeros((4, 6, 3, 3))
        p = np.ones((4, 6, 3, 3)) * 2.0
        np.testing.assert_allclose(mse_per_timestep(t, p), np.full(6, 4.0))

    def test_correlation_perfect(self):
        rng = np.random.RandomState(0)
        t = rng.randn(8, 5, 4, 3)
        c = correlation_per_timestep(t, t.copy())
        np.testing.assert_allclose(c, np.ones(5), atol=1e-9)

    def test_energy_drift(self):
        e = np.full((4, 6, 1), 2.0)
        e[:, 3:] = 2.2
        d = energy_drift_per_timestep(e)
        np.testing.assert_allclose(d[:3], 0.0, atol=1e-12)
        assert (d[3:] > 0).all()

    def test_mean_std_over_seeds_ddof(self):
        mean, std = mean_std_over_seeds([np.array([1.0, 2.0]),
                                         np.array([3.0, 4.0])])
        np.testing.assert_allclose(mean, [2.0, 3.0])
        np.testing.assert_allclose(std, np.std([[1, 2], [3, 4]], axis=0,
                                               ddof=1))

    def test_avg_loss_until_corr(self):
        losses = np.array([1.0, 2.0, 3.0, 4.0])
        corr = np.array([0.999, 0.995, 0.5, 0.1])
        idx, avg = avg_loss_until_corr(losses, corr, threshold=0.99)
        assert idx == 2
        assert avg == 1.5

    def test_avg_loss_until_corr_never_drops(self):
        """Correlation never below threshold: the reference's index=-1 slice
        averages all but the LAST timestep while reporting the full horizon
        (plotting.py:902-911)."""
        losses = np.array([1.0, 2.0, 3.0, 4.0])
        corr = np.full(4, 0.999)
        idx, avg = avg_loss_until_corr(losses, corr, threshold=0.99)
        assert idx == 4
        assert avg == 2.0  # mean of [1,2,3], last step excluded

    def test_analyze_group(self, artifacts):
        out = analyze_group(artifacts)
        assert out["n_seeds"] == 3
        assert out["mse_mean"].shape == (8,)
        assert np.isclose(out["test_loss_mean"], 0.2)
        assert (out["corr_mean"] > 0.9).all()

    def test_short_horizon_loss(self):
        """loss@h ignores the divergent tail beyond h and its finite-aware
        companion excludes samples that blow up INSIDE the horizon."""
        targets = np.zeros((4, 30, 5, 3))
        preds = np.ones((4, 20, 5, 3))
        preds[:, 16:] = 1e12          # diverges only beyond frame 16
        preds[3, 5:] = np.inf         # sample 3 diverges inside the horizon
        loss, loss_f, ff = short_horizon_loss(
            {"targets": targets, "preds": preds}, h_frames=16)
        assert not np.isfinite(loss)      # all-sample loss sees the inf
        assert np.isclose(loss_f, 1.0)    # finite samples: (1-0)^2
        assert np.isclose(ff, 0.75)       # 3 of 4 samples finite inside h

    def test_short_horizon_loss_frames_per_entry(self):
        """The horizon is PHYSICAL frames: a per-window artifact (SEGNO
        logs one entry per num_timesteps=10-frame window) takes only the
        entries whose frame index fits inside h_frames — 2 entries at the
        default 20-frame horizon — so the column is comparable with EGNO's
        per-frame artifacts instead of silently spanning 10x the horizon."""
        targets = np.zeros((4, 20, 5, 3))
        preds = np.ones((4, 20, 5, 3))
        preds[:, 2:] = 1e12           # windows 3+ (frames 30+) diverge
        loss, loss_f, ff = short_horizon_loss(
            {"targets": targets, "preds": preds}, frames_per_entry=10)
        assert np.isclose(loss, 1.0)      # only frames 10,20 inside horizon
        assert np.isclose(ff, 1.0)
        # per-frame artifact at the same default horizon: 20 entries
        loss2, _, _ = short_horizon_loss(
            {"targets": targets[:, :1].repeat(20, 1),
             "preds": np.full((4, 20, 5, 3), 2.0)})
        assert np.isclose(loss2, 4.0)

    def test_latex_table(self):
        t = latex_table([("egno charged-5", 0.0123, 0.002)])
        assert r"\begin{table}" in t and "0.0123" in t

    def test_short_horizon_loss_bound_mult(self):
        """bound_mult scales the converged-range heuristic (the 10x rule
        from loop.py _finite_metrics): a sample whose excursion sits
        between 3x and 30x the target range flips classification exactly
        there — what scripts/bound_sensitivity.py sweeps over the
        committed grids."""
        targets = np.ones((4, 10, 5, 3))          # target range max = 1
        preds = np.ones((4, 10, 5, 3))
        preds[2, 5] = 12.0                        # 12x: inside 30x, outside 10x/3x
        preds[3, 5] = 5.0                         # 5x: inside 10x/30x, outside 3x
        ffs = {m: short_horizon_loss({"targets": targets, "preds": preds},
                                     h_frames=10, bound_mult=m)[2]
               for m in (3.0, 10.0, 30.0)}
        assert np.isclose(ffs[3.0], 0.5)
        assert np.isclose(ffs[10.0], 0.75)
        assert np.isclose(ffs[30.0], 1.0)
        # the bound floors at max(range, 1): tiny-coordinate targets don't
        # shrink the window below bound_mult itself
        small = {"targets": targets * 1e-3, "preds": preds * 1e-3}
        assert np.isclose(short_horizon_loss(small, h_frames=10,
                                             bound_mult=3.0)[2], 1.0)

    def test_bound_sensitivity_matches_finite_metrics(self):
        """scripts/bound_sensitivity.full_horizon_finite recomputes the
        _finite_metrics (train/loop.py) converged-range rule from a stored
        artifact; the two implementations must agree at every swept bound,
        or the published robustness note would sweep a *different* rule
        than the finite-fraction columns it vouches for."""
        import importlib.util
        from pathlib import Path

        from nonode_tpu.train.loop import _finite_metrics

        spec = importlib.util.spec_from_file_location(
            "bound_sensitivity",
            Path(__file__).resolve().parent.parent
            / "scripts" / "bound_sensitivity.py")
        bs = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bs)

        rng = np.random.RandomState(7)
        targets = rng.randn(6, 12, 5, 3).astype(np.float32)
        preds = targets + 0.1
        preds[0, 4] = 1e9                       # diverged at every bound
        bound_3x = 3.0 * max(float(np.abs(targets).max()), 1.0)
        preds[1, 7] = bound_3x + 1e-3           # just past 3x, inside 10x
        preds[2, 2] = np.nan                    # non-finite
        art = {"targets": targets, "preds": preds}
        for m in (3.0, 10.0, 30.0):
            assert bs.full_horizon_finite(art, m) == \
                _finite_metrics(art, bound_mult=m)["finite_fraction"]
        assert bs.full_horizon_finite(art, 3.0) < \
            bs.full_horizon_finite(art, 10.0)

    def test_roundtrip(self, artifacts):
        a = load_artifact(artifacts[0])
        assert set(a) == {"targets", "preds", "energy_conservation",
                          "test_loss"}


class TestRegistry:
    def test_scan_and_report(self, tmp_path):
        from nonode_tpu.analysis.registry import build_report, scan_results
        rng = np.random.RandomState(0)
        d = tmp_path / "exp"
        d.mkdir()
        for seed in (1, 2):
            t = rng.randn(8, 10, 5, 3)
            np.savez(d / (f"EGNO_charged_seed={seed}_n_part=5_n_inputs=1"
                          f"_dT_1_varDT=False_num_timesteps=10_results.npz"),
                     targets=t, preds=t[:, :4] + 0.1,
                     energy_conservation=np.ones((8, 4, 1)),
                     test_loss=0.25)
        reg = scan_results(tmp_path)
        assert len(reg) == 1
        (key, seeds), = reg.items()
        assert set(seeds) == {"1", "2"}
        report = build_report(tmp_path, tmp_path / "out")
        g = report["groups"][key]
        assert np.isclose(g["test_loss_mean"], 0.25)
        assert (tmp_path / "out" / "report.json").exists()
        assert (tmp_path / "out" / "table.tex").exists()

    def test_mixed_framework_tree(self, tmp_path):
        """A mixed artifact tree (reference torch *_results.pt + nonode
        *_results.npz, same config) aggregates as TWO seed-band groups keyed
        by src=torch|jax — the cross-framework comparison the reference's
        plotting layer performs from wandb artifacts
        (plotting.py:981-1116)."""
        import torch

        from nonode_tpu.analysis.registry import build_report, scan_results
        rng = np.random.RandomState(0)
        base = ("EGNO_charged_seed={s}_n_part=5_n_inputs=1_dT_1"
                "_varDT=False_num_timesteps=10_results.{ext}")
        (tmp_path / "ref").mkdir()
        (tmp_path / "jax").mkdir()
        for seed in (1, 2):
            t = rng.randn(8, 10, 5, 3)
            np.savez(tmp_path / "jax" / base.format(s=seed, ext="npz"),
                     targets=t, preds=t[:, :4] + 0.1,
                     energy_conservation=np.ones((8, 4, 1)), test_loss=0.25)
            torch.save({"targets": torch.tensor(t),
                        "preds": torch.tensor(t[:, :4] + 0.2),
                        "energy_conservation": torch.ones(8, 4, 1),
                        "test_loss": 0.5},
                       tmp_path / "ref" / base.format(s=seed, ext="pt"))
        def src_of(key):
            return dict(p.split("=") for p in key.split("_")
                        if "=" in p)["src"]

        reg = scan_results(tmp_path)
        assert len(reg) == 2
        assert {src_of(k) for k in reg} == {"torch", "jax"}
        report = build_report(tmp_path, tmp_path / "out")
        by_src = {src_of(k): g for k, g in report["groups"].items()}
        assert np.isclose(by_src["jax"]["test_loss_mean"], 0.25)
        assert np.isclose(by_src["torch"]["test_loss_mean"], 0.5)
        assert (tmp_path / "out" / "mse_curves.png").exists()

    def test_legend_labels_with_underscored_values(self, tmp_path, monkeypatch):
        """Legend relabeling must not truncate field values at '_': two
        groups differing only in dataset 'charged_a' vs 'charged_b' get
        distinct full-value labels (regression: a key re-parse with [^_]+
        collapsed both to 'dataset=charged' and dropped one curve)."""
        import nonode_tpu.analysis.results as results_mod
        from nonode_tpu.analysis.registry import build_report

        rng = np.random.RandomState(0)
        d = tmp_path / "exp"
        d.mkdir()
        for ds in ("charged_a", "charged_b"):
            t = rng.randn(8, 10, 5, 3)
            np.savez(d / (f"EGNO_{ds}_seed=1_n_part=5_n_inputs=1"
                          f"_dT_1_varDT=False_num_timesteps=10_results.npz"),
                     targets=t, preds=t[:, :4] + 0.1,
                     energy_conservation=np.ones((8, 4, 1)), test_loss=0.25)
        captured = {}

        def fake_plot(curves, out_path, **kw):
            captured.update(curves)

        monkeypatch.setattr(results_mod, "plot_multiple_curves", fake_plot)
        build_report(tmp_path, tmp_path / "out")
        assert set(captured) == {"dataset=charged_a", "dataset=charged_b"}

    def test_exclude_transplant_dirs(self, tmp_path):
        """Artifacts under transplant* dirs (cross-framework weight-
        transplant rollouts, scripts/rollout_transplant.py) carry native-run
        filenames; the scanner must skip them or they silently OVERWRITE
        same-seed native entries (transplant_b sorts after ref/)."""
        import torch

        from nonode_tpu.analysis.registry import scan_results
        rng = np.random.RandomState(0)
        name = ("EGNO_charged_seed=1_n_part=5_n_inputs=1_dT_1"
                "_varDT=False_num_timesteps=10_results.pt")
        t = rng.randn(8, 10, 5, 3)
        for d, loss in [("ref", 0.5), ("transplant_b", 99.0)]:
            (tmp_path / d).mkdir()
            torch.save({"targets": torch.tensor(t),
                        "preds": torch.tensor(t[:, :4]),
                        "energy_conservation": torch.ones(8, 4, 1),
                        "test_loss": loss}, tmp_path / d / name)
        from pathlib import Path

        reg = scan_results(tmp_path)
        (paths,), = [g.values() for g in reg.values()]
        assert Path(paths).parent.name == "ref"
        # opting out of the exclusion picks the overwriting entry back up
        reg_all = scan_results(tmp_path, exclude=())
        (paths_all,), = [g.values() for g in reg_all.values()]
        assert Path(paths_all).parent.name == "transplant_b"


class TestSweep:
    def test_expand_base_grid(self):
        cfgs = expand_grid(DEFAULT_SCHEDULE["BASE"])
        # 2 datasets x 2 models x 3 n_balls x 5 seeds = 60
        assert len(cfgs) == 60
        assert {c["model"] for c in cfgs} == {"segno", "egno"}

    def test_expand_pro_grid(self):
        cfgs = expand_grid(DEFAULT_SCHEDULE["PRO"])
        # 2 models x 2 datasets x 2 n_balls x 2 num_inputs x 3 seeds x 2 varDT
        assert len(cfgs) == 96

    def test_config_id_stable(self):
        cfgs = expand_grid(DEFAULT_SCHEDULE["BASE"])
        ids = {config_id(c) for c in cfgs}
        assert len(ids) == len(cfgs)

    def test_r3_reordered_schedule_covers_base_grid(self):
        """scripts/base_ref_schedule_r3.yaml only re-ORDERS the BASE grid
        (gravity/egno/20 first); its config_id set must equal the built-in
        grid's exactly, or the resume ledger would silently skip/duplicate
        cells."""
        from pathlib import Path

        from nonode_tpu.parallel.sweep import load_schedule
        repo = Path(__file__).resolve().parents[1]
        spec = load_schedule(str(repo / "scripts/base_ref_schedule_r3.yaml"),
                             "BASE")
        reordered = expand_grid(spec)
        builtin = expand_grid(DEFAULT_SCHEDULE["BASE"])
        assert ({config_id(c) for c in reordered}
                == {config_id(c) for c in builtin})
        first = reordered[0]
        assert (first["dataset"], first["model"], first["n_balls"]) == \
            ("gravity", "egno", 20)

    def test_summarize_groups_by_seed(self):
        results = [
            {"config": {"model": "egno", "seed": 1}, "test_loss": 0.1},
            {"config": {"model": "egno", "seed": 2}, "test_loss": 0.3},
            {"config": {"model": "segno", "seed": 1}, "test_loss": 0.5},
        ]
        s = summarize(results)
        key = json.dumps({"model": "egno"}, sort_keys=True)
        assert np.isclose(s[key]["mean"], 0.2)
        assert s[key]["n_seeds"] == 2


class TestArtifactStem:
    def test_round_trips_fname_re(self):
        """artifact_stem is the single definition of the filename contract;
        it must always parse back through FNAME_RE (scan_results)."""
        from nonode_tpu.analysis.registry import FNAME_RE, artifact_stem
        for kw in ({}, {"num_inputs": 3, "varDT": True},
                   {"dT": 2, "num_timesteps": 5}):
            s = artifact_stem("egno", "charged", 7, 20, **kw)
            m = FNAME_RE.match(s + "_results.npz")
            assert m and m.group("seed") == "7" and m.group("n_balls") == "20"


class TestLedgerStride:
    """load_ledger_groups passes the per-model artifact stride to
    short_horizon_loss: EGNO artifacts log per FRAME, SEGNO per
    num_timesteps=10-frame WINDOW, so the h20 column must take 20 EGNO
    entries but only 2 SEGNO entries (regression: both models were sliced
    at 16 entries = a 10x longer physical horizon for SEGNO)."""

    def test_per_model_frames_per_entry(self, tmp_path):
        from nonode_tpu.analysis.ledger import load_ledger_groups
        from nonode_tpu.analysis.registry import artifact_stem

        art_dir = tmp_path / "_exp_new"
        art_dir.mkdir(parents=True)
        with open(tmp_path / "sweep_TEST.jsonl", "w") as f:
            for model in ("egno", "segno"):
                cfg = {"exp_name": "_exp_new", "dataset": "charged",
                       "model": model, "n_balls": 5, "num_inputs": 1,
                       "varDT": False, "seed": 1}
                f.write(json.dumps({
                    "config_id": model, "config": cfg, "test_loss": 1.0,
                    "best_val_loss": 0.01, "best_epoch": 5}) + "\n")
                targets = np.zeros((4, 20, 5, 3), np.float32)
                preds = np.ones((4, 20, 5, 3), np.float32)
                preds[:, 2:] = 100.0  # accurate only in the first 2 entries
                stem = artifact_stem(model, "charged", 1, 5)
                np.savez(art_dir / f"{stem}_results.npz",
                         targets=targets, preds=preds, test_loss=1.0)

        groups = load_ledger_groups(tmp_path)
        egno = groups[("egno", "charged", 5, 1, False)][0]
        segno = groups[("segno", "charged", 5, 1, False)][0]
        # SEGNO: 2 windows (frames 10, 20) inside the 20-frame horizon
        assert np.isclose(segno["h20"], 1.0)
        # EGNO: 20 per-frame entries, 18 of them diverged
        assert egno["h20"] > 1000

    def test_non_default_windowing_forwarded(self, tmp_path):
        """A grid that sweeps num_timesteps/dT must still find its artifacts
        (the stem encodes them) and use the swept SEGNO window stride —
        a stale default meant silent-NaN companions."""
        from nonode_tpu.analysis.ledger import load_ledger_groups
        from nonode_tpu.analysis.registry import artifact_stem

        art_dir = tmp_path / "_exp_new"
        art_dir.mkdir(parents=True)
        cfg = {"exp_name": "_exp_new", "dataset": "charged",
               "model": "segno", "n_balls": 5, "num_inputs": 1,
               "varDT": False, "seed": 1, "num_timesteps": 5, "dT": 2}
        with open(tmp_path / "sweep_TEST.jsonl", "w") as f:
            f.write(json.dumps({
                "config_id": "t5", "config": cfg, "test_loss": 1.0,
                "best_val_loss": 0.01, "best_epoch": 5}) + "\n")
        targets = np.zeros((4, 8, 5, 3), np.float32)
        preds = np.ones((4, 8, 5, 3), np.float32)
        preds[:, 4:] = 100.0  # accurate only in the first 4 entries
        stem = artifact_stem("segno", "charged", 1, 5, dT=2, num_timesteps=5)
        np.savez(art_dir / f"{stem}_results.npz",
                 targets=targets, preds=preds, test_loss=1.0)

        rec = load_ledger_groups(tmp_path)[("segno", "charged", 5, 1,
                                            False)][0]
        # artifact found (not NaN) and stride = num_timesteps=5: the
        # 20-frame horizon takes 4 windows, all in the accurate region
        assert np.isclose(rec["h20"], 1.0)


class TestProtocolCompare:
    """scripts/protocol_compare.py — the «300ep vs ref-protocol» join."""

    @staticmethod
    def _write_outf(outf, best_val, best_epoch, seeds=(1, 2),
                    per_seed=None):
        rng = np.random.RandomState(0)
        art_dir = outf / "_exp_new"
        art_dir.mkdir(parents=True)
        with open(outf / "sweep_TEST.jsonl", "w") as f:
            for s in seeds:
                bv, be = (per_seed or {}).get(s, (best_val, best_epoch))
                cfg = {"exp_name": "_exp_new", "dataset": "charged",
                       "model": "egno", "n_balls": 5, "num_inputs": 1,
                       "varDT": False, "seed": s}
                f.write(json.dumps({
                    "config_id": f"seed={s}", "config": cfg,
                    "test_loss": 1.0, "best_val_loss": bv,
                    "best_epoch": be}) + "\n")
                targets = rng.randn(4, 20, 5, 3).astype(np.float32)
                stem = (f"EGNO_charged_seed={s}_n_part=5_n_inputs=1"
                        f"_dT_1_varDT=False_num_timesteps=10_results.npz")
                np.savez(art_dir / stem, targets=targets,
                         preds=targets[:, :8] + 0.1, test_loss=1.0)

    def test_join_and_unconverged_count(self, tmp_path):
        import subprocess
        import sys as _sys
        from pathlib import Path

        short, ref = tmp_path / "short", tmp_path / "ref"
        self._write_outf(short, best_val=0.02, best_epoch=295)
        self._write_outf(ref, best_val=0.01, best_epoch=950)
        script = Path(__file__).resolve().parent.parent / "scripts" \
            / "protocol_compare.py"
        out = subprocess.run(
            [_sys.executable, str(script), "--short", str(short),
             "--ref", str(ref)], capture_output=True, text=True, check=True,
        ).stdout
        row = [ln for ln in out.splitlines() if ln.startswith("| egno")][0]
        assert "0.0200" in row and "0.0100" in row   # both protocols joined
        assert "-50%" in row                          # delta vs 300ep
        assert "950 [950-950]" in row                 # ref best_epoch spread
        assert "2/2 reference-protocol cells" in out  # unconverged tally

    def test_nan_seed_reported_as_finite_stats_plus_count(self, tmp_path):
        """A seed that destabilizes under the full protocol ends with
        best_val = NaN (reference-faithful: NaN val lands in the
        improvement branch of EGNO/utils.py:261-268 and never stops).
        The group row must report finite-seed stats + an explicit NaN
        count instead of collapsing to 'nan ± nan'."""
        import subprocess
        import sys as _sys
        from pathlib import Path

        short, ref = tmp_path / "short", tmp_path / "ref"
        self._write_outf(short, best_val=0.02, best_epoch=295)
        self._write_outf(ref, best_val=None, best_epoch=None,
                         per_seed={1: (0.01, 950),
                                   2: (float("nan"), 999)})
        script = Path(__file__).resolve().parent.parent / "scripts" \
            / "protocol_compare.py"
        out = subprocess.run(
            [_sys.executable, str(script), "--short", str(short),
             "--ref", str(ref)], capture_output=True, text=True, check=True,
        ).stdout
        row = [ln for ln in out.splitlines() if ln.startswith("| egno")][0]
        assert "0.0100" in row and "(1/2 fin)" in row
        assert "nan" not in row.split("(1/2 fin)")[0]  # no nan ± nan
        assert "950 [950-950]" in row   # epochs over finite seeds only
        assert "-50%" in row            # delta uses the finite-seed mean


class _FakeStorage:
    """Mimics PyG BaseStorage: keys live in _mapping, not __dict__."""

    def __init__(self, mapping):
        self._mapping = mapping


class _FakePyGData:
    def __init__(self, mapping):
        self._store = _FakeStorage(mapping)


class TestRealPyGLayout:
    def test_load_reference_results_reads_store_mapping(self, tmp_path):
        """Real torch_geometric Data keeps attributes in _store._mapping;
        the artifact scanner must find targets/preds there (regression:
        only _store.__dict__ was scanned and real-PyG pickles raised)."""
        import torch

        from nonode_tpu.analysis.results import load_artifact
        t = torch.randn(3, 4, 5, 3)
        obj = _FakePyGData({"targets": t, "preds": t[:, :2] + 0.1,
                            "energy_conservation": torch.ones(3, 2, 1),
                            "test_loss": 0.5})
        p = tmp_path / "fake_results.pt"
        torch.save(obj, p)
        art = load_artifact(p)
        assert art["targets"].shape == (3, 4, 5, 3)
        assert art["preds"].shape == (3, 2, 5, 3)
        assert float(art["test_loss"]) == 0.5


class TestLedgerDedupe:
    def test_inherited_rows_counted_once(self, tmp_path):
        """A resumable ledger may inherit rows from a sibling ledger in the
        same outf (pro_ref/sweep_PRO.jsonl inherits the PRO_HEADLINE
        cells); group statistics must not double-count those seeds."""
        import json
        from nonode_tpu.analysis.ledger import load_ledger_groups
        cfg = {"model": "segno", "dataset": "charged", "n_balls": 5,
               "num_inputs": 2, "varDT": True, "seed": 1,
               "exp_name": "_exp_new"}
        row = {"config_id": "cid1", "config": cfg, "test_loss": 1.0,
               "best_val_loss": 0.5, "best_epoch": 10}
        (tmp_path / "sweep_A.jsonl").write_text(json.dumps(row) + "\n")
        row2 = dict(row, inherited_from="sweep_A.jsonl")
        row3 = dict(row, config_id="cid2",
                    config=dict(cfg, seed=2), best_val_loss=0.7)
        (tmp_path / "sweep_B.jsonl").write_text(
            json.dumps(row2) + "\n" + json.dumps(row3) + "\n")
        groups = load_ledger_groups(tmp_path)
        (key,) = groups.keys()
        assert len(groups[key]) == 2, "inherited row double-counted"
        assert sorted(x["val"] for x in groups[key]) == [0.5, 0.7]


class TestCompanionSnapshot:
    """scripts/companion_snapshot.py + the ledger/compare fallbacks: the
    rollout artifacts behind the loss@20f / finite@20f columns are
    gitignored and machine resets have wiped them twice (round 4: 18
    cells; round 5: the whole tree), so the companions must survive in a
    committed snapshot the loaders fall back to."""

    @staticmethod
    def _snapshot_module():
        import importlib.util
        from pathlib import Path
        spec = importlib.util.spec_from_file_location(
            "companion_snapshot",
            Path(__file__).resolve().parent.parent
            / "scripts" / "companion_snapshot.py")
        cs = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(cs)
        return cs

    @staticmethod
    def _write_cell(outf, seed=1, accurate_entries=20):
        from nonode_tpu.analysis.registry import artifact_stem
        art_dir = outf / "_exp_new"
        art_dir.mkdir(parents=True, exist_ok=True)
        cfg = {"exp_name": "_exp_new", "dataset": "charged",
               "model": "egno", "n_balls": 5, "num_inputs": 1,
               "varDT": False, "seed": seed}
        with open(outf / "sweep_TEST.jsonl", "a") as f:
            f.write(json.dumps({
                "config_id": f"seed={seed}", "config": cfg,
                "test_loss": 1.0, "best_val_loss": 0.01,
                "best_epoch": 5}) + "\n")
        targets = np.zeros((4, 24, 5, 3), np.float32)
        preds = np.ones((4, 24, 5, 3), np.float32)
        preds[:, accurate_entries:] = 100.0
        stem = artifact_stem("egno", "charged", seed, 5)
        path = art_dir / f"{stem}_results.npz"
        np.savez(path, targets=targets, preds=preds, test_loss=1.0,
                 finite_fraction=0.75, test_loss_finite=0.5)
        return path

    def test_seed_fallback_survives_artifact_wipe(self, tmp_path):
        from nonode_tpu.analysis.ledger import load_ledger_groups
        cs = self._snapshot_module()
        art = self._write_cell(tmp_path)
        live = load_ledger_groups(tmp_path)[
            ("egno", "charged", 5, 1, False)][0]
        fresh, total = cs.snapshot(tmp_path)
        assert (fresh, total) == (1, 1)
        art.unlink()  # the reset
        snap = load_ledger_groups(tmp_path)[
            ("egno", "charged", 5, 1, False)][0]
        for k in ("ff", "tlf", "h20", "ff20"):
            assert np.isclose(snap[k], live[k]), (k, snap[k], live[k])

    def test_snapshot_merge_keeps_wiped_entries(self, tmp_path):
        """Re-snapshotting after a wipe must not erase the previously
        recorded rows (merge, not overwrite)."""
        cs = self._snapshot_module()
        art = self._write_cell(tmp_path, seed=1)
        cs.snapshot(tmp_path)
        art.unlink()
        self._write_cell(tmp_path, seed=2)
        fresh, total = cs.snapshot(tmp_path)
        assert (fresh, total) == (1, 2)
        rows = [json.loads(l) for l in
                (tmp_path / "companions.jsonl").read_text().splitlines()]
        assert {r["config_id"] for r in rows} == {"seed=1", "seed=2"}

    def test_group_fallback_in_compare_table(self, tmp_path):
        """compare_table consumes a transcribed group row ONLY when every
        per-seed companion in the group is NaN (artifacts and seed
        snapshot both gone); live per-seed values always win."""
        import importlib.util
        from pathlib import Path
        spec = importlib.util.spec_from_file_location(
            "protocol_compare",
            Path(__file__).resolve().parent.parent
            / "scripts" / "protocol_compare.py")
        pc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pc)

        ref = tmp_path / "ref"
        self._write_cell(ref)
        group_row = {"kind": "group",
                     "key": ["egno", "charged", 5, 1, False],
                     "h20_med": 7.77, "ff20_mean": 0.12,
                     "provenance": "test"}
        (ref / "companions.jsonl").write_text(json.dumps(group_row) + "\n")
        # live artifact present -> per-seed values win over the group row
        lines, _ = pc.compare_table(tmp_path / "none", ref)
        row = [ln for ln in lines if ln.startswith("| egno")][0]
        assert "7.77" not in row and "| 1.00 |" in row
        # artifact wiped, no seed snapshot -> group transcription used
        for art in (ref / "_exp_new").glob("*_results.npz"):
            art.unlink()
        lines, _ = pc.compare_table(tmp_path / "none", ref)
        row = [ln for ln in lines if ln.startswith("| egno")][0]
        assert "7.77" in row and "0.12" in row
