"""Pin the thin script-layer glue that the package tests don't reach.

The parity anchor (scripts/parity_e2e.py) builds one shared argv for the
reference driver (/root/reference/main.py:37-60) and nonode_tpu.main; a
config knob recorded in anchor_config.json but not forwarded there would
silently train both sides at the flag's default while the report header
claims otherwise.
"""

import importlib.util
import sys
from pathlib import Path
from types import SimpleNamespace

REPO = Path(__file__).resolve().parent.parent


def _load_parity_e2e():
    spec = importlib.util.spec_from_file_location(
        "_parity_e2e_under_test", REPO / "scripts" / "parity_e2e.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


class TestCommonArgv:
    def test_forwards_every_training_knob(self):
        """Each anchor knob that changes training must reach both drivers."""
        mod = _load_parity_e2e()
        cfg = SimpleNamespace(dataset="gravity", n_balls=10, epochs=7,
                              batch_size=25, max_samples=123, traj_len=3,
                              num_inputs=2, varDT=True,
                              data_dir=Path("/tmp/anchor/data"))
        argv = mod.common_argv(cfg, seed=9, outf=Path("/tmp/anchor/out"))
        got = dict(zip(argv[::2], argv[1::2]))
        assert got == {
            "--dataset": "gravity", "--n_balls": "10",
            "--data_dir": "/tmp/anchor/data", "--epochs": "7",
            "--test_interval": "5", "--batch_size": "25",
            "--max_samples": "123", "--num_inputs": "2", "--varDT": "True",
            "--traj_len": "3", "--seed": "9",
            "--outf": "/tmp/anchor/out"}

    def test_both_drivers_accept_the_argv(self):
        """The shared argv must parse on the nonode_tpu side (the reference
        parser's flags are pinned at /root/reference/main.py:37-60)."""
        mod = _load_parity_e2e()
        cfg = SimpleNamespace(dataset="charged", n_balls=5, epochs=2,
                              batch_size=10, max_samples=50, traj_len=2,
                              num_inputs=2, varDT=True,
                              data_dir=Path("/tmp/d"))
        argv = mod.common_argv(cfg, seed=1, outf=Path("/tmp/o"))
        from nonode_tpu.main import get_args
        args = get_args(["--model", "segno"] + argv)
        assert args.n_balls == 5 and args.dataset == "charged"
        assert args.num_inputs == 2 and args.varDT is True


class TestTwoSidedChecks:
    """Pin the shared two-sided tolerance rule (parity_e2e.two_sided_checks,
    reused by scripts/parity_pro.py) — matched groups must pass all four
    checks, a 10x-worse jax side must fail band+upper, and a tail-only
    spike must fail tail while head stays clean."""

    def test_matched_groups_pass(self):
        mod = _load_parity_e2e()
        gr = {"mse_mean": [1.0, 2.0, 3.0, 4.0], "test_losses": [0.5, 0.6],
              "test_loss_mean": 0.55}
        gj = {"mse_mean": [1.1, 2.1, 2.9, 4.2], "test_losses": [0.5, 0.7],
              "test_loss_mean": 0.6}
        ev = mod.two_sided_checks(gr, gj)
        assert all(ev["checks"].values())
        assert abs(ev["geo"] - 1.0) < 0.1

    def test_uniform_10x_fails_band_and_upper(self):
        mod = _load_parity_e2e()
        gr = {"mse_mean": [1.0, 2.0, 3.0, 4.0], "test_losses": [0.5, 0.6],
              "test_loss_mean": 0.55}
        gj = {"mse_mean": [10.0, 20.0, 30.0, 40.0], "test_losses": [5.0, 7.0],
              "test_loss_mean": 6.0}
        ev = mod.two_sided_checks(gr, gj)
        assert not ev["checks"]["band"] and not ev["checks"]["upper"]
        # two-sided: 10x BETTER fails the same checks except upper
        ev2 = mod.two_sided_checks(gj, gr)
        assert not ev2["checks"]["band"] and ev2["checks"]["upper"]

    def test_tail_spike_fails_tail_with_clean_head(self):
        mod = _load_parity_e2e()
        gr = {"mse_mean": [1.0] * 12, "test_losses": [1.0, 1.0],
              "test_loss_mean": 1.0}
        gj = {"mse_mean": [1.0] * 8 + [40.0] * 4, "test_losses": [1.0, 1.1],
              "test_loss_mean": 1.05}
        ev = mod.two_sided_checks(gr, gj)
        assert not ev["checks"]["tail"]
        assert ev["sig_stats"]["head_geo"] < 1.5
        assert ev["sig_stats"]["tail_worst"] > 3.0


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "_bench_under_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


class TestRooflineCompileFallback:
    """bench.py roofline rows: B=64 at N=100 deterministically crashes this
    machine's remote tpu_compile_helper; the row must fall back to B=32 and
    record the substitution instead of emitting an error row."""

    def test_fallback_row_notes_the_substitution(self, monkeypatch):
        mod = _load_bench()
        calls = []

        def fake_setup(**kw):
            calls.append(kw)
            if kw.get("n") == 100 and kw["b"] > 32:
                raise RuntimeError("INTERNAL: remote_compile: HTTP 500")
            return ("exp", "p", "o", "arrays", "idx", "perm")

        monkeypatch.setattr(mod, "_egno_setup", fake_setup)
        monkeypatch.setattr(
            mod, "_measure_epoch",
            lambda *a, reps=0: (0.1, 1e12))
        monkeypatch.setattr(mod, "_peak_flops",
                            lambda: (197e12, "fake-tpu"))
        rows = {r["metric"]: r for r in mod.bench_compute_bound()}

        g = rows["roofline_egno_gravity100_B64"]
        assert "error" not in g
        assert g["value"] == 320.0          # 32 / 0.1 — measured at B=32
        assert "B=64" in g["note"] and "B=32" in g["note"]
        # rows whose first attempt succeeds carry no substitution note
        assert "note" not in rows["roofline_egno_charged20_B512"]
        assert rows["roofline_egno_charged20_B512"]["value"] == 5120.0
