"""Driver-level tests: the unified CLI flow end to end on the virtual
8-device CPU mesh, including --dp/--space mesh sharding (sharded training
must reproduce single-device results — distribution is an implementation
detail, not a semantics change)."""

import jax
import numpy as np
import pytest

from nonode_tpu.main import get_args, main

pytestmark = pytest.mark.slow  # multi-minute tier; quick: -m 'not slow'


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    from nonode_tpu.sim.simulators import ChargedSim, sample_batch
    d = tmp_path_factory.mktemp("driver_data")
    sim = ChargedSim(n_balls=5)
    for part, n, seed in (("train", 24, 0), ("valid", 16, 1), ("test", 16, 2)):
        loc, vel, edges, charges = sample_batch(
            sim, jax.random.PRNGKey(seed), n, 5000, 100)   # 49 frames
        np.save(d / f"loc_{part}_charged5_initvel1small.npy",
                np.asarray(loc).transpose(0, 1, 3, 2))
        np.save(d / f"vel_{part}_charged5_initvel1small.npy",
                np.asarray(vel).transpose(0, 1, 3, 2))
        np.save(d / f"edges_{part}_charged5_initvel1small.npy",
                np.asarray(edges))
        np.save(d / f"charges_{part}_charged5_initvel1small.npy",
                np.asarray(charges))
    return d


@pytest.fixture(scope="module")
def tiny_data_n4(tmp_path_factory):
    """4-ball charged data (N divisible by space=2 for dp x space tests)."""
    from nonode_tpu.sim.simulators import ChargedSim, sample_batch
    d = tmp_path_factory.mktemp("driver_data_n4")
    sim = ChargedSim(n_balls=4)
    for part, n, seed in (("train", 24, 0), ("valid", 16, 1), ("test", 16, 2)):
        loc, vel, edges, charges = sample_batch(
            sim, jax.random.PRNGKey(seed), n, 5000, 100)
        np.save(d / f"loc_{part}_charged4_initvel1small.npy",
                np.asarray(loc).transpose(0, 1, 3, 2))
        np.save(d / f"vel_{part}_charged4_initvel1small.npy",
                np.asarray(vel).transpose(0, 1, 3, 2))
        np.save(d / f"edges_{part}_charged4_initvel1small.npy",
                np.asarray(edges))
        np.save(d / f"charges_{part}_charged4_initvel1small.npy",
                np.asarray(charges))
    return d


def run_driver(tiny_data, tmp_path, model, extra=()):
    args = get_args([
        "--model", model, "--dataset", "charged",
        "--data_dir", str(tiny_data), "--epochs", "2",
        "--test_interval", "1", "--batch_size", "8", "--max_samples", "24",
        "--traj_len", "1", "--seed", "7",
        "--outf", str(tmp_path), *extra])
    return main(args)


class TestConfigByFile:
    def test_json_preset_merge(self, tmp_path):
        """--config_by_file merges JSON over existing args (JSON wins for
        keys it contains, unknown keys ignored), matching
        main_simulation_simple_no.py:389-399."""
        import json
        preset = {"epochs": 123, "batch_size": 7, "unknown_key": 1,
                  "num_timesteps": 5}
        p = tmp_path / "preset.json"
        p.write_text(json.dumps(preset))
        args = get_args(["--model", "egno", "--epochs", "9",
                         "--config_by_file", str(p)])
        assert args.epochs == 123
        assert args.batch_size == 7
        assert args.num_timesteps == 5
        assert not hasattr(args, "unknown_key")

    def test_bare_flag_loads_default_preset(self):
        args = get_args(["--model", "egno", "--config_by_file"])
        assert args.exp_name == "simulation_exp"
        assert args.batch_size == 100

    def test_preset_hyperparameters_reach_model(self, tiny_data, tmp_path,
                                                monkeypatch):
        """Preset hyperparameter keys (lr/nf/n_layers/...) must take effect
        like in the reference standalone driver, whose parser carries them
        directly (main_simulation_simple_no.py:389-399) — not be silently
        dropped because this unified parser keeps them in the model
        config."""
        import json as _json

        import nonode_tpu.main as m
        preset = {"lr": 0.5, "nf": 8, "n_layers": 1,
                  "max_training_samples": 16}
        p = tmp_path / "hp.json"
        p.write_text(_json.dumps(preset))
        cap_model, cap_exp = {}, {}
        real_model, real_exp = m.EGNO, m.EGNOExperiment

        def spy_model(**kw):
            cap_model.update(kw)
            return real_model(**kw)

        def spy_exp(model, **kw):
            cap_exp.update(kw)
            return real_exp(model, **kw)

        monkeypatch.setattr(m, "EGNO", spy_model)
        monkeypatch.setattr(m, "EGNOExperiment", spy_exp)
        run_driver(tiny_data, tmp_path, "egno",
                   extra=["--config_by_file", str(p)])
        assert cap_model["hidden_nf"] == 8
        assert cap_model["n_layers"] == 1
        assert cap_exp["lr"] == 0.5


class TestMeshDriver:
    @pytest.mark.parametrize("model", ["egno", "segno"])
    def test_dp_sharded_matches_single_device(self, tiny_data, tmp_path,
                                              model):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        ref = run_driver(tiny_data, tmp_path / "single", model)
        dp = run_driver(tiny_data, tmp_path / "dp4", model,
                        extra=["--dp", "4"])
        # (best_val, test_loss, best_epoch)
        assert ref[2] == dp[2]
        np.testing.assert_allclose(dp[0], ref[0], rtol=2e-4)
        np.testing.assert_allclose(dp[1], ref[1], rtol=2e-4)

    @pytest.mark.parametrize("model", ["egno", "segno"])
    def test_precision_bf16_flag(self, tiny_data, tmp_path, model):
        """--precision bf16 (the opt-in speed mode) trains end to end and
        produces finite losses close to the fp32 run at these tiny scales
        (same data/seed; bf16 only changes fwd/bwd rounding)."""
        ref = run_driver(tiny_data, tmp_path / "fp32", model)
        bf = run_driver(tiny_data, tmp_path / "bf16", model,
                        extra=["--precision", "bf16"])
        assert np.isfinite(bf[0]) and np.isfinite(bf[1])
        # 2-epoch losses start near init; bf16 rounding moves them by a
        # few percent at most, not orders of magnitude
        np.testing.assert_allclose(bf[0], ref[0], rtol=0.2)

    @pytest.mark.parametrize("model", ["egno", "segno"])
    def test_fleet_driver_with_compaction(self, tiny_data, tmp_path, model):
        """fleet_main end to end for both models: patience=1 forces early
        stops mid-run, exercising fleet compaction; per-seed artifacts and
        records must still come out complete."""
        from nonode_tpu.fleet_main import get_args as fleet_args, \
            main as fleet_main
        records = fleet_main(fleet_args([
            "--model", model, "--dataset", "charged",
            "--data_dir", str(tiny_data), "--epochs", "8",
            "--test_interval", "1", "--batch_size", "8",
            "--max_samples", "24", "--traj_len", "1", "--patience", "1",
            "--seeds", "1,2,3", "--outf", str(tmp_path)]))
        assert len(records) == 3
        for r in records:
            assert np.isfinite(r["best_val_loss"])
            assert np.isfinite(r["test_loss"])
        arts = list((tmp_path / "0exp_fleet").glob("*_results.npz"))
        assert len(arts) == 3

    @pytest.mark.parametrize("model", ["egno", "segno"])
    def test_dp_space_mesh_matches_single_device(self, tiny_data_n4,
                                                 tmp_path, model):
        """Full dp x space mesh for BOTH models: particle axis sharded over
        'space' (requires N % space == 0, driver-enforced) — must reproduce
        the single-device training. For SEGNO this exercises the multi-axis
        P(None,'data',sp)/P('data',sp) constraint path (loop.py:_constrain)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        n4 = ["--n_balls", "4"]
        ref = run_driver(tiny_data_n4, tmp_path / "single", model, extra=n4)
        dpsp = run_driver(tiny_data_n4, tmp_path / "dpsp", model,
                          extra=n4 + ["--dp", "4", "--space", "2"])
        np.testing.assert_allclose(dpsp[0], ref[0], rtol=2e-4)
        np.testing.assert_allclose(dpsp[1], ref[1], rtol=2e-4)

    @pytest.mark.parametrize("varDT", [True, False])
    def test_fleet_multi_input_matches_sequential_driver(self, tiny_data,
                                                         tmp_path, varDT):
        """EGNO PRO-grid fleets (num_inputs>1, varDT): the vmapped fleet
        must reproduce per-seed sequential driver runs — same per-seed rng
        consumption order (train perm, then train input offsets, then val
        input offsets on eval epochs, then the test windows), same early-
        stopping decisions, same rollout numbers. This is what lets the
        sweep harness run the PRO grid's EGNO groups as fleets."""
        from nonode_tpu.fleet_main import get_args as fleet_args, \
            main as fleet_main
        common = ["--dataset", "charged", "--data_dir", str(tiny_data),
                  "--epochs", "4", "--test_interval", "2",
                  "--batch_size", "8", "--max_samples", "24",
                  "--traj_len", "1", "--num_inputs", "2",
                  "--varDT", str(varDT)]
        seq = {}
        for seed in (7, 8):
            args = get_args(["--model", "egno", "--seed", str(seed),
                             "--outf", str(tmp_path / f"seq{seed}"), *common])
            seq[seed] = main(args)       # (best_val, test_loss, best_epoch)
        records = fleet_main(fleet_args(
            ["--model", "egno", "--seeds", "7,8",
             "--outf", str(tmp_path / "fleet"), *common]))
        for rec, seed in zip(records, (7, 8)):
            bv, tl, be = seq[seed]
            assert rec["best_epoch"] == be, f"seed {seed}"
            np.testing.assert_allclose(rec["best_val_loss"], bv, rtol=1e-4)
            np.testing.assert_allclose(rec["test_loss"], tl, rtol=1e-4)

    def test_fleet_final_epoch_eval(self, tiny_data, tmp_path):
        """The fleet driver must evaluate at the final epoch even when it
        falls off the test_interval grid (matching main.py's
        `or epoch == epochs - 1`): with test_interval > epochs the ONLY
        eval is the forced final one — without it best_val would stay inf
        and the exported checkpoints would be the random init."""
        from nonode_tpu.fleet_main import get_args as fleet_args, \
            main as fleet_main
        records = fleet_main(fleet_args([
            "--model", "segno", "--dataset", "charged",
            "--data_dir", str(tiny_data), "--epochs", "3",
            "--test_interval", "10", "--batch_size", "8",
            "--max_samples", "24", "--traj_len", "1",
            "--seeds", "1,2", "--outf", str(tmp_path)]))
        assert len(records) == 2
        for r in records:
            assert np.isfinite(r["best_val_loss"])
            assert r["best_epoch"] == 2


class TestDeferredTrainLossFlush:
    def test_every_epoch_logged(self, tiny_data, tmp_path):
        """Train losses are flushed from device in test_interval batches
        (one stacked transfer per eval, see main.py flush_train_losses);
        the results JSON must still carry one finite entry per epoch —
        including tail epochs after the last eval point."""
        import json as _json
        args = get_args([
            "--model", "egno", "--dataset", "charged",
            "--data_dir", str(tiny_data), "--epochs", "5",
            "--test_interval", "2", "--batch_size", "8",
            "--max_samples", "24", "--traj_len", "1", "--seed", "7",
            "--outf", str(tmp_path)])
        main(args)
        j = next((tmp_path / "0exp_new").glob("EGNO_*[!s].json"))
        res = _json.loads(j.read_text())
        assert len(res["train loss"]) == 5
        assert all(np.isfinite(v) for v in res["train loss"])
        # evals at epochs 2 and 4 (epoch 4 == epochs-1 is forced)
        assert res["eval epoch"] == [2, 4]
        assert len(res["val loss"]) == 2


class TestFleetCheckpointResume:
    def test_resume_reproduces_uninterrupted_run(self, tiny_data, tmp_path):
        """Mid-run fleet checkpointing (the wedge-survival mechanism for
        multi-hour fleets on the tunneled chip): a fleet killed after a
        checkpoint and re-invoked must produce records identical to the
        uninterrupted run — device state, stopper state, alive compaction,
        and every seed's host rng stream all round-trip."""
        from nonode_tpu.fleet_main import get_args as fleet_args, \
            main as fleet_main
        common = ["--model", "egno", "--dataset", "charged",
                  "--data_dir", str(tiny_data), "--epochs", "8",
                  "--test_interval", "1", "--batch_size", "8",
                  "--max_samples", "24", "--traj_len", "1",
                  "--seeds", "1,2", "--checkpoint_every", "3"]
        ref = fleet_main(fleet_args(
            [*common, "--outf", str(tmp_path / "straight")]))

        with pytest.raises(RuntimeError, match="simulated wedge"):
            fleet_main(fleet_args(
                [*common, "--outf", str(tmp_path / "resumed"),
                 "--_die_at_epoch", "4"]))
        state = list((tmp_path / "resumed" / "0exp_fleet")
                     .glob("fleet_state_*.pkl"))
        assert len(state) == 1, "no mid-run state saved before the crash"
        res = fleet_main(fleet_args(
            [*common, "--outf", str(tmp_path / "resumed")]))
        assert not state[0].exists(), "state not cleaned up after completion"

        assert len(res) == len(ref) == 2
        for a, b in zip(ref, res):
            assert a["best_epoch"] == b["best_epoch"]
            assert a["best_val_loss"] == b["best_val_loss"]
            np.testing.assert_allclose(b["test_loss"], a["test_loss"],
                                       rtol=1e-6)
