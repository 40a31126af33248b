"""Training-loop tests: loss decreases, epoch scan correctness, rollout
shapes, metrics semantics vs the reference definitions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonode_tpu.data.nbody import NBodyDataset
from nonode_tpu.models.egno import EGNO
from nonode_tpu.models.segno import SEGNO
from nonode_tpu.train.loop import (EGNOExperiment, SEGNOExperiment, make_perm,
                                   prepare_inputs)
from nonode_tpu.train.metrics import (conserved_energy, energy_drift,
                                      pearson_correlation_batch,
                                      tot_energy_charged_batch)


@pytest.fixture(scope="module")
def charged_ds(tmp_path_factory):
    """Physically plausible tiny dataset from the JAX simulator."""
    from nonode_tpu.sim.simulators import ChargedSim, sample_batch
    d = tmp_path_factory.mktemp("train_data")
    sim = ChargedSim(n_balls=5)
    loc, vel, edges, charges = sample_batch(
        sim, jax.random.PRNGKey(0), 24, 5000, 100)   # 49 frames
    np.save(d / "loc_train_charged5_initvel1small.npy",
            np.asarray(loc).transpose(0, 1, 3, 2))
    np.save(d / "vel_train_charged5_initvel1small.npy",
            np.asarray(vel).transpose(0, 1, 3, 2))
    np.save(d / "edges_train_charged5_initvel1small.npy", np.asarray(edges))
    np.save(d / "charges_train_charged5_initvel1small.npy", np.asarray(charges))
    return d


class TestEGNOTraining:
    def test_loss_decreases(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=5)
        model = EGNO(n_layers=2, hidden_nf=16, num_timesteps=5, time_emb_dim=8,
                     num_modes=2)
        exp = EGNOExperiment(model, lr=5e-3, weight_decay=1e-8)
        params, opt_state = exp.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        idx_arrays = {k: jnp.asarray(v)
                      for k, v in exp.epoch_index_arrays(ds, rng).items()}
        first = last = None
        for _ in range(12):
            perm = make_perm(rng, len(ds), 8)
            params, opt_state, losses, _ = exp.train_epoch(
                params, opt_state, arrays, idx_arrays, perm)
            loss = float(np.mean(np.asarray(losses)))
            first = loss if first is None else first
            last = loss
        assert last < first * 0.7, f"no learning: {first} -> {last}"

    @pytest.mark.slow
    def test_bf16_compute_mode_traces(self, charged_ds):
        """The opt-in bf16 speed mode must trace and step: time embeddings
        adopt the node-feature dtype (egno.py) so the concat doesn't promote
        h back to fp32 against bf16 edge features (regression: mixed-dtype
        assert in first_edge_linear fired at trace time)."""
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=5)
        model = EGNO(n_layers=2, hidden_nf=16, num_timesteps=5,
                     time_emb_dim=8, num_modes=2)
        exp = EGNOExperiment(model, lr=5e-3, weight_decay=1e-8,
                             compute_dtype=jnp.bfloat16)
        params, opt_state = exp.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        idx_arrays = {k: jnp.asarray(v)
                      for k, v in exp.epoch_index_arrays(ds, rng).items()}
        perm = make_perm(rng, len(ds), 8)
        params, opt_state, losses, _ = exp.train_epoch(
            params, opt_state, arrays, idx_arrays, perm)
        assert np.isfinite(np.asarray(losses)).all()

    def test_rollout_shapes(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=4, traj_len=3)
        model = EGNO(n_layers=1, hidden_nf=8, num_timesteps=4, time_emb_dim=4,
                     num_modes=2)
        exp = EGNOExperiment(model)
        params, _ = exp.init(jax.random.PRNGKey(1))
        test_loss, avg_steps, artifact = exp.test_rollout(
            params, ds, batch_size=8, rng=np.random.RandomState(0))
        assert np.isfinite(test_loss)
        b = (len(ds) // 8) * 8
        assert artifact["targets"].shape[0] == b
        assert artifact["preds"].shape[0] == b
        cut = int(0.4 * 3 * 4)
        assert artifact["preds"].shape[1] == cut
        assert artifact["energy_conservation"].shape == (b, cut, 1)

    def test_multi_input_epoch(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=6, num_inputs=2, varDT=True)
        model = EGNO(n_layers=1, hidden_nf=8, num_timesteps=6, time_emb_dim=4,
                     num_modes=2, num_inputs=2, varDT=True)
        exp = EGNOExperiment(model)
        params, opt_state = exp.init(jax.random.PRNGKey(2))
        rng = np.random.RandomState(0)
        arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        idx_arrays = {k: jnp.asarray(v)
                      for k, v in exp.epoch_index_arrays(ds, rng).items()}
        perm = make_perm(rng, len(ds), 8)
        params, opt_state, losses, _ = exp.train_epoch(
            params, opt_state, arrays, idx_arrays, perm)
        assert np.isfinite(np.asarray(losses)).all()


class TestSEGNOTraining:
    def test_loss_decreases(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=5)
        model = SEGNO(hidden_nf=16, n_layers=5)
        exp = SEGNOExperiment(model, num_timesteps=5, lr=5e-3)
        params, opt_state = exp.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        frames, in_steps, _ = exp.input_frames(ds, None)
        first = last = None
        for _ in range(20):
            perm = make_perm(rng, len(ds), 8)
            params, opt_state, losses = exp.train_epoch(
                params, opt_state, arrays, perm, frames, in_steps)
            loss = float(np.mean(np.asarray(losses)))
            first = loss if first is None else first
            last = loss
        assert last < first * 0.8, f"no learning: {first} -> {last}"

    @pytest.mark.slow
    def test_bf16_compute_mode_traces(self, charged_ds):
        """SEGNO's opt-in bf16 speed mode (fp32 master weights, bf16
        fwd/bwd, fp32 loss) must trace+step on BOTH epoch programs: the
        static path and the per-batch varDT dynamic path."""
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=6, num_inputs=2)
        model = SEGNO(hidden_nf=16, n_layers=4, multiple_agg="attn")
        exp = SEGNOExperiment(model, num_timesteps=6, lr=5e-3,
                              compute_dtype=jnp.bfloat16)
        params, opt_state = exp.init(jax.random.PRNGKey(0))
        arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        rng = np.random.RandomState(0)
        perm = make_perm(rng, len(ds), 8)
        frames, in_steps, _ = exp.input_frames(ds, (3,))
        params, opt_state, losses = exp.train_epoch(
            params, opt_state, arrays, perm, frames, in_steps)
        assert np.isfinite(np.asarray(losses)).all()
        assert jax.tree.leaves(params)[0].dtype == jnp.float32  # master fp32

        steps = exp.sample_steps_batched(ds, rng, True, len(perm))
        frames_d = jnp.asarray(exp.frames_from_steps(ds, steps))
        params, opt_state, losses = exp.train_epoch_dynamic(
            params, opt_state, arrays, perm, frames_d, exp.max_interior(ds))
        assert np.isfinite(np.asarray(losses)).all()

    def test_rollout(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=4, traj_len=3)
        model = SEGNO(hidden_nf=8, n_layers=4)
        exp = SEGNOExperiment(model, num_timesteps=4)
        params, _ = exp.init(jax.random.PRNGKey(1))
        test_loss, avg_steps, artifact = exp.test_rollout(
            params, ds, batch_size=8, rng=np.random.RandomState(0),
            traj_len=3, varDT=False)
        assert np.isfinite(test_loss)
        assert artifact["preds"].shape[1] == 3   # one frame per window

    def test_multi_input_rollout(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=4, num_inputs=3, traj_len=4)
        model = SEGNO(hidden_nf=8, n_layers=4, multiple_agg="attn")
        exp = SEGNOExperiment(model, num_timesteps=4)
        params, _ = exp.init(jax.random.PRNGKey(3))
        test_loss, _, artifact = exp.test_rollout(
            params, ds, batch_size=8, rng=np.random.RandomState(0),
            traj_len=4, varDT=False)
        assert np.isfinite(test_loss)
        assert artifact["preds"].shape[1] == 4

    def test_multi_input_frames(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=6, num_inputs=2)
        exp = SEGNOExperiment(SEGNO(hidden_nf=8, multiple_agg="attn"),
                              num_timesteps=6)
        steps = exp.sample_steps(ds, np.random.RandomState(0), varDT=False)
        assert steps == (3,)
        frames, in_steps, end = exp.input_frames(ds, steps)
        assert frames == (27, 30)
        assert in_steps == (-3, 0)
        assert end == 36


@pytest.fixture(scope="module")
def gravity_ds(tmp_path_factory):
    """Tiny gravity-layout dataset: start=0, so multi-input windows are
    pushed FORWARD (dataset_simple.py:147-150) — the configs where the
    reference's batch-global time normalization and start-anchored rollout
    targets differ from per-sample anchoring."""
    d = tmp_path_factory.mktemp("gravity_data")
    rng = np.random.RandomState(7)
    loc = rng.randn(12, 49, 5, 3).astype(np.float32)
    vel = rng.randn(12, 49, 5, 3).astype(np.float32)
    masses = rng.uniform(0.5, 2.0, (12, 5, 1)).astype(np.float32)
    np.save(d / "loc_train_gravity5_initvel1small.npy", loc)
    np.save(d / "vel_train_gravity5_initvel1small.npy", vel)
    np.save(d / "edges_train_gravity5_initvel1small.npy",
            np.zeros((12, 5, 5), np.float32))
    np.save(d / "charges_train_gravity5_initvel1small.npy", masses)
    return d


class TestGravityShiftedWindowParity:
    """Reference semantics for shifted (start=0) multi-input windows."""

    def test_segno_rollout_targets_anchor_at_reference_start(self, gravity_ds):
        """Rollout target frames = post-shift `start` + cumsum(T)
        (train_nbody.py:104-107,136-137): for gravity multi-input that is
        the FIRST input frame (0), reproducing the reference's own
        off-by-sum(steps) anchoring — not the physically-aligned last
        input frame."""
        ds = NBodyDataset(data_dir=gravity_ds, partition="train",
                          dataset="gravity", num_timesteps=6, num_inputs=2,
                          traj_len=2)
        exp = SEGNOExperiment(SEGNO(hidden_nf=8, multiple_agg="attn"),
                              num_timesteps=6)
        params, _ = exp.init(jax.random.PRNGKey(0))
        steps = exp.sample_steps(ds, np.random.RandomState(0), False)
        frames, in_steps, _ = exp.input_frames(ds, steps)
        assert frames == (0, 3) and in_steps == (0, 3)  # shifted window
        _, _, art = exp.test_rollout(params, ds, len(ds),
                                     np.random.RandomState(0), 2, False)
        # reference anchor: start=0 -> targets at frames 6, 12 (NOT 9, 15)
        expected = np.asarray(ds.loc)[:, [6, 12]]
        np.testing.assert_allclose(art["targets"], expected, rtol=0, atol=0)

    def test_egno_batch_global_time_normalization(self, gravity_ds):
        """t_in/t_out subtract the BATCH-wide max input frame
        (main_simulation_simple_no.py:208-209), not each sample's own last
        frame: samples with a smaller varDT push-forward shift get strictly
        negative t_in[-1]."""
        ds = NBodyDataset(data_dir=gravity_ds, partition="train",
                          dataset="gravity", num_timesteps=6, num_inputs=2,
                          varDT=True)
        model = EGNO(n_layers=1, hidden_nf=8, num_timesteps=6,
                     time_emb_dim=4, num_modes=2, num_inputs=2)
        exp = EGNOExperiment(model, lr=1e-3, weight_decay=0.0)
        rng = np.random.RandomState(0)
        idx_arrays = {k: jnp.asarray(v)
                      for k, v in exp.epoch_index_arrays(ds, rng).items()}
        frames_in = np.asarray(idx_arrays["frames_in"])
        assert len(set(frames_in[:, -1])) > 1, "fixture: shifts must differ"
        arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        idx = jnp.arange(len(ds))
        batch = exp._batch(arrays, idx_arrays, idx)
        t_in, t_out = np.asarray(batch[5]), np.asarray(batch[6])
        m = frames_in.max()
        np.testing.assert_allclose(t_in, frames_in - m, atol=0)
        out_frames = np.asarray(idx_arrays["out_frames"])
        np.testing.assert_allclose(t_out, out_frames - m, atol=0)


@pytest.mark.slow
class TestSEGNODynamicSampling:
    """Per-batch varDT segment resampling — the reference resamples inside
    the batch loop (SEGNO/train_nbody.py:97-116); the dynamic epoch path
    reproduces that granularity inside one jitted scan."""

    def test_integrate_masked_equals_integrate(self):
        model = SEGNO(hidden_nf=8, n_layers=4)
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        b, n = 3, 5
        h = jnp.asarray(rng.randn(b, n, 8), jnp.float32)
        x = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
        v = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
        ea = jnp.asarray(rng.randn(b, n, n, 2), jnp.float32)
        for k in (1, 3, 5):
            hs, xs, vs = model.integrate(params, h, x, v, ea, k)
            hm, xm, vm = model.integrate_masked(params, h, x, v, ea,
                                                jnp.int32(k), 5)
            np.testing.assert_array_equal(np.asarray(xs), np.asarray(xm))
            np.testing.assert_array_equal(np.asarray(vs), np.asarray(vm))
            np.testing.assert_array_equal(np.asarray(hs), np.asarray(hm))

    def test_forward_dynamic_matches_static(self):
        model = SEGNO(hidden_nf=8, n_layers=4, multiple_agg="attn")
        params = model.init(jax.random.PRNGKey(1))
        rng = np.random.RandomState(1)
        L, b, n = 3, 2, 5
        his = jnp.asarray(rng.randn(L, b, n, 1), jnp.float32)
        x = jnp.asarray(rng.randn(L, b, n, 3), jnp.float32)
        v = jnp.asarray(rng.randn(L, b, n, 3), jnp.float32)
        ea = jnp.asarray(rng.randn(b, n, n, 2), jnp.float32)
        xs, hs, vs = model(params, his, x, v, ea, T=6, in_steps=(0, 2, 5))
        xd, hd, vd = model.forward_dynamic(params, his, x, v, ea,
                                           jnp.asarray([2, 3]), T=6,
                                           max_interior=4)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xd),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vd),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(hs), np.asarray(hd),
                                   rtol=0, atol=0)

    def test_train_epoch_dynamic_matches_static(self, charged_ds):
        """With constant (non-varDT) steps both epoch programs must produce
        the same params and losses."""
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=6, num_inputs=2)
        model = SEGNO(hidden_nf=8, n_layers=4, multiple_agg="attn")
        exp = SEGNOExperiment(model, num_timesteps=6, lr=1e-3)
        params, opt_state = exp.init(jax.random.PRNGKey(2))
        arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        perm = make_perm(np.random.RandomState(0), len(ds), 8)

        frames_t, in_steps, _ = exp.input_frames(ds, (3,))
        p_s, _, losses_s = exp.train_epoch(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state),
            arrays, perm, frames_t, in_steps)

        steps = exp.sample_steps_batched(ds, np.random.RandomState(0), False,
                                         len(perm))
        frames = jnp.asarray(exp.frames_from_steps(ds, steps))
        np.testing.assert_array_equal(np.asarray(frames[0]), frames_t)
        p_d, _, losses_d = exp.train_epoch_dynamic(
            params, opt_state, arrays, perm, frames, exp.max_interior(ds))

        np.testing.assert_allclose(np.asarray(losses_s), np.asarray(losses_d),
                                   rtol=1e-6)
        for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_sampler_parity_reference_transcription(self):
        """Pinned parity with the reference's per-batch sampling, transcribed
        from SEGNO/train_nbody.py:100-114 (varDT branch + frame arithmetic),
        for both the charged (start=30, never pushed) and gravity (start=0,
        always pushed) regimes."""
        from types import SimpleNamespace
        exp = SEGNOExperiment(SEGNO(hidden_nf=8), num_timesteps=10)
        for start in (30, 0):
            ds = SimpleNamespace(num_inputs=3, start=start)
            rng_ours = np.random.RandomState(7)
            rng_ref = np.random.RandomState(7)
            nb = 16
            steps = exp.sample_steps_batched(ds, rng_ours, True, nb)
            frames = exp.frames_from_steps(ds, steps)
            for b in range(nb):
                # --- transcription of train_nbody.py:100-114 ---
                st = rng_ref.randint(1, 10 // 3, size=3 - 1).tolist()
                indices = np.flip(start - np.cumsum([0] + st))
                if (indices < 0).any():
                    indices = indices + -indices.min()
                end = indices[-1] + 10
                # -----------------------------------------------
                np.testing.assert_array_equal(frames[b], indices)
                assert frames[b, -1] + 10 == end

    def test_rollout_varDT_multi_input(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=6, num_inputs=2, traj_len=2)
        model = SEGNO(hidden_nf=8, n_layers=4, multiple_agg="attn")
        exp = SEGNOExperiment(model, num_timesteps=6)
        params, _ = exp.init(jax.random.PRNGKey(4))
        test_loss, _, artifact = exp.test_rollout(
            params, ds, batch_size=8, rng=np.random.RandomState(0),
            traj_len=2, varDT=True)
        assert np.isfinite(test_loss)
        assert artifact["preds"].shape[1] == 2

    def test_varDT_epoch_trains(self, charged_ds):
        ds = NBodyDataset(data_dir=charged_ds, partition="train",
                          num_timesteps=6, num_inputs=2)
        model = SEGNO(hidden_nf=8, n_layers=4, multiple_agg="attn")
        exp = SEGNOExperiment(model, num_timesteps=6, lr=2e-3)
        params, opt_state = exp.init(jax.random.PRNGKey(5))
        arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        rng = np.random.RandomState(0)
        first = last = None
        for _ in range(10):
            perm = make_perm(rng, len(ds), 8)
            steps = exp.sample_steps_batched(ds, rng, True, len(perm))
            frames = jnp.asarray(exp.frames_from_steps(ds, steps))
            params, opt_state, losses = exp.train_epoch_dynamic(
                params, opt_state, arrays, perm, frames, exp.max_interior(ds))
            loss = float(np.mean(np.asarray(losses)))
            first = loss if first is None else first
            last = loss
        assert np.isfinite(last)
        assert last < first, f"no learning: {first} -> {last}"


class TestMetrics:
    def test_pearson_perfect_correlation(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(10, 12, 3), jnp.float32)
        corr, avg_steps, first_fail = pearson_correlation_batch(x, x, 4)
        cut = 4
        np.testing.assert_allclose(np.asarray(corr), np.ones((3, cut)),
                                   atol=1e-5)
        assert float(avg_steps) == cut
        assert int(first_fail) == cut

    def test_pearson_anticorrelated(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(10, 12, 3), jnp.float32)
        corr, avg_steps, first_fail = pearson_correlation_batch(x, -x, 4)
        assert float(avg_steps) == 0
        assert int(first_fail) == 0

    def test_energy_drift(self):
        e = jnp.asarray([[2.0], [2.2], [1.8]])
        d = energy_drift(e)
        np.testing.assert_allclose(np.asarray(d[:, 0]),
                                   [0.0, 0.1, 0.1], atol=1e-5)

    def test_charged_energy_matches_sim(self):
        """The metrics energy must equal the simulator's oracle."""
        from nonode_tpu.sim.simulators import ChargedSim
        sim = ChargedSim(n_balls=5)
        loc, vel, edges, q = sim.sample_trajectory(jax.random.PRNGKey(0),
                                                   T=500, sample_freq=100)
        e_sim = sim.energy(loc[0], vel[0], edges)
        e_metric = tot_energy_charged_batch(loc[0], vel[0], edges)
        np.testing.assert_allclose(float(e_sim), float(e_metric), rtol=1e-5)

    def test_conserved_energy_dispatch(self):
        rng = np.random.RandomState(0)
        loc = jnp.asarray(rng.randn(2, 4, 3), jnp.float32)
        vel = jnp.asarray(rng.randn(2, 4, 3), jnp.float32)
        q = jnp.asarray(rng.choice([-1.0, 1.0], (2, 4, 1)), jnp.float32)
        e = conserved_energy("charged", loc, vel, q)
        assert e.shape == (2,)
        m = jnp.abs(q)
        e2 = conserved_energy("gravity", loc, vel, m)
        assert e2.shape == (2,)


class TestAuxMetrics:
    def test_spring_energy_matches_sim(self):
        from nonode_tpu.sim.simulators import SpringSim
        from nonode_tpu.train.metrics import tot_energy_spring_batch
        sim = SpringSim(n_balls=5)
        loc, vel, edges, _ = sim.sample_trajectory(jax.random.PRNGKey(0),
                                                   T=500, sample_freq=100)
        e_sim = sim.energy(loc[0], vel[0], edges)
        e_m = tot_energy_spring_batch(loc[0], vel[0], edges)
        np.testing.assert_allclose(float(e_sim), float(e_m), rtol=1e-5)

    def test_cumulative_random_indices(self):
        from nonode_tpu.train.metrics import (
            cumulative_random_tensor_indices,
            cumulative_random_tensor_indices_capped)
        rng = np.random.RandomState(0)
        cum, arr = cumulative_random_tensor_indices(rng, 5, 1, 4)
        assert (arr >= 1).all() and (arr < 4).all()
        np.testing.assert_array_equal(cum, np.cumsum(arr))
        cum, arr = cumulative_random_tensor_indices_capped(rng, 6, 1, 40,
                                                           maximum=100)
        assert cum[-1] == 100


class TestPerm:
    def test_drop_last(self):
        perm = make_perm(np.random.RandomState(0), 23, 8)
        assert perm.shape == (2, 8)
        assert len(np.unique(perm)) == 16

    def test_prepare_inputs_shapes(self):
        rng = np.random.RandomState(0)
        loc = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
        vel = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
        w = jnp.asarray(rng.randn(2, 5, 5, 1), jnp.float32)
        q = jnp.asarray(rng.randn(2, 5, 1), jnp.float32)
        nodes, edge_attr, loc_mean = prepare_inputs(loc, vel, w, q)
        assert nodes.shape == (2, 5, 2)
        assert edge_attr.shape == (2, 5, 5, 2)
        assert loc_mean.shape == (2, 5, 3)
        np.testing.assert_allclose(np.asarray(loc_mean[0, 0]),
                                   np.asarray(loc[0].mean(0)), rtol=1e-5)
