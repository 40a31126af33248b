"""Mesh-parallelism tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonode_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      make_sharded_train_step, replicated,
                                      _egno_batch_shardings, shard_batch)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


@pytest.mark.slow
class TestMesh:
    def test_make_mesh_shapes(self, eight_devices):
        mesh = make_mesh(8, space=2)
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("data", "space")

    def test_dp_step_matches_single_device(self, eight_devices):
        """The sharded training step must produce the same loss and params
        as the unsharded one — dp is an implementation detail."""
        from nonode_tpu.models.egno import EGNO
        from nonode_tpu.train.loop import EGNOExperiment
        import optax

        model = EGNO(n_layers=1, hidden_nf=8, num_timesteps=4, time_emb_dim=4,
                     num_modes=2)
        exp = EGNOExperiment(model)
        params, opt_state = exp.init(jax.random.PRNGKey(0))

        b, n, t, L = 16, 4, 4, 1
        rng = np.random.RandomState(0)
        batch = (
            rng.randn(b, L, n, 3).astype(np.float32),
            rng.randn(b, L, n, 3).astype(np.float32),
            rng.choice([-1.0, 1.0], (b, n, 1)).astype(np.float32),
            rng.randn(b, n, n, 1).astype(np.float32),
            rng.randn(b, t, n, 3).astype(np.float32),
            np.zeros((b, L), np.float32),
            np.broadcast_to(np.arange(1, t + 1, dtype=np.float32), (b, t)).copy(),
        )

        # single-device reference
        (loss_ref, _), grads = jax.value_and_grad(exp._loss, has_aux=True)(
            params, tuple(jnp.asarray(x) for x in batch))
        updates, _ = exp.optimizer.update(grads, opt_state, params)
        params_ref = optax.apply_updates(params, updates)

        mesh = make_mesh(8, space=2)
        shardings = _egno_batch_shardings(mesh, shard_particles=True)
        sharded = shard_batch(batch, shardings)
        step = make_sharded_train_step(exp, mesh, shard_particles=True)
        params_dp, _, loss_dp = step(params, opt_state, sharded)

        np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)

    def test_graft_dryrun(self, eight_devices):
        import __graft_entry__ as g
        g.dryrun_multichip(8)
        g.dryrun_multichip(4)


class TestEvalSharding:
    def test_strided_no_padding(self):
        from nonode_tpu.parallel.fleet import eval_shard_indices
        n, world = 23, 4
        shards = [eval_shard_indices(n, world, r) for r in range(world)]
        assert sum(len(s) for s in shards) == n
        all_idx = np.sort(np.concatenate(shards))
        np.testing.assert_array_equal(all_idx, np.arange(n))
        np.testing.assert_array_equal(shards[1], np.arange(1, n, world))

    def test_shuffled_deterministic(self):
        from nonode_tpu.parallel.fleet import eval_shard_indices
        a = eval_shard_indices(20, 2, 0, shuffle=True, seed=3, epoch=5)
        b = eval_shard_indices(20, 2, 0, shuffle=True, seed=3, epoch=5)
        np.testing.assert_array_equal(a, b)
        c = eval_shard_indices(20, 2, 0, shuffle=True, seed=3, epoch=6)
        assert not np.array_equal(a, c)


class TestFleetEarlyStopping:
    def test_matches_sequential_decisions(self, tmp_path):
        """Fleet early stopping must make exactly the decisions K sequential
        EarlyStopping instances make — same stop evals, same best vals —
        including the exact-tie-counts-as-improvement rule."""
        from nonode_tpu.parallel.fleet import FleetEarlyStopping
        from nonode_tpu.train.checkpoint import EarlyStopping

        rng = np.random.RandomState(0)
        k, e, patience = 5, 40, 3
        vals = rng.rand(k, e).astype(np.float64)
        vals[1, 5:] = vals[1, 5]             # exact-tie plateau: never stops
        vals[2] = np.linspace(1.0, 0.1, e)   # monotone: never stops
        vals[3, 3:] = vals[3, 3] + 0.1       # stops at 3 + patience
        vals[4, 10:] = np.nan                # blowup: NaN counts as
        # improvement in the reference (score < best + delta is False for
        # NaN) and the seed never stops — the fleet must reproduce that

        fes = FleetEarlyStopping(k, patience=patience)
        fleet_stop = np.full(k, -1)
        for ep in range(e):
            fes(vals[:, ep], ep)
            fleet_stop = np.where((fleet_stop < 0) & fes.stopped, ep,
                                  fleet_stop)

        for i in range(k):
            es = EarlyStopping(patience=patience,
                               path=tmp_path / f"{i}.ckpt")
            seq_stop, seq_best_ep = -1, 0
            for ep in range(e):
                es(float(vals[i, ep]), {"w": np.zeros(1)})
                if es.counter == 0:      # improvement -> checkpoint saved
                    seq_best_ep = ep
                if es.early_stop:
                    seq_stop = ep
                    break
            assert fleet_stop[i] == seq_stop, f"seed {i}"
            np.testing.assert_allclose(fes.best_val[i], es.val_loss_min)
            assert fes.best_epoch[i] == seq_best_ep, f"seed {i}"


@pytest.mark.slow
class TestSeedFleet:
    def test_fleet_matches_individual_training(self, tmp_path):
        """A vmapped K-seed epoch must produce exactly what K separate
        trainings produce."""
        from nonode_tpu.models.egno import EGNO
        from nonode_tpu.parallel.fleet import SeedFleet
        from nonode_tpu.train.loop import EGNOExperiment

        model = EGNO(n_layers=1, hidden_nf=8, num_timesteps=3, time_emb_dim=4,
                     num_modes=2)
        exp = EGNOExperiment(model, lr=1e-3)
        fleet = SeedFleet(exp, seeds=[0, 1, 2])

        s, n, t = 32, 4, 3
        rng = np.random.RandomState(0)
        loc = jnp.asarray(rng.randn(s, 20, n, 3), jnp.float32)
        vel = jnp.asarray(rng.randn(s, 20, n, 3), jnp.float32)
        charges = jnp.asarray(rng.choice([-1.0, 1.0], (s, n, 1)), jnp.float32)
        w = jnp.einsum("sik,sjk->sij", charges, charges)[..., None]
        arrays = (loc, vel, charges, w)
        out_frames = np.broadcast_to(np.arange(11, 11 + t), (s, t)).copy()
        idx_arrays = {
            "frames_in": jnp.full((s, 1), 10, jnp.int32),
            "t_in": jnp.zeros((s, 1), jnp.float32),
            "out_frames": jnp.asarray(out_frames.astype(np.int32)),
            "t_out": jnp.asarray((out_frames - 10).astype(np.float32)),
        }
        perms = fleet.make_perms([np.random.RandomState(s_) for s_ in range(3)],
                                 s, 8)

        params, opt_state = fleet.init()
        # fleet init must equal a TRULY independent exp.init per seed (not
        # asserted against itself) and replicas must differ across seeds
        p1, o1 = exp.init(jax.random.PRNGKey(1))
        for a, b in zip(jax.tree.leaves(jax.tree.map(lambda x: x[1], params)),
                        jax.tree.leaves(p1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        l0 = jax.tree.leaves(jax.tree.map(lambda x: x[0], params))
        l1 = jax.tree.leaves(jax.tree.map(lambda x: x[1], params))
        assert any(not np.array_equal(a, b) for a, b in zip(l0, l1)), \
            "fleet replicas share identical init weights"
        p2, o2, losses, _ = fleet.train_epoch(params, opt_state, arrays,
                                              idx_arrays, jnp.asarray(perms))

        # replica 1 individually, from the independent init
        p1b, o1b, losses1, _ = exp.train_epoch(p1, o1, arrays, idx_arrays,
                                               jnp.asarray(perms[1]))
        np.testing.assert_allclose(np.asarray(losses[1]), np.asarray(losses1),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(jax.tree.map(lambda x: x[1], p2)),
                        jax.tree.leaves(p1b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_segno_fleet_matches_individual_training(self):
        """The SEGNO fleet epoch must reproduce per-seed sequential
        training exactly (extends the EGNO fleet-equivalence test)."""
        from nonode_tpu.models.segno import SEGNO
        from nonode_tpu.parallel.fleet import SeedFleet
        from nonode_tpu.train.loop import SEGNOExperiment

        model = SEGNO(hidden_nf=8, n_layers=4)
        exp = SEGNOExperiment(model, num_timesteps=3, lr=1e-3)
        fleet = SeedFleet(exp, seeds=[0, 1, 2])

        s, n = 32, 4
        rng = np.random.RandomState(1)
        loc = jnp.asarray(rng.randn(s, 20, n, 3), jnp.float32)
        vel = jnp.asarray(rng.randn(s, 20, n, 3), jnp.float32)
        charges = jnp.asarray(rng.choice([-1.0, 1.0], (s, n, 1)), jnp.float32)
        w = jnp.einsum("sik,sjk->sij", charges, charges)[..., None]
        arrays = (loc, vel, charges, w)
        frames, in_steps = (10,), None
        perms = fleet.make_perms([np.random.RandomState(s_) for s_ in range(3)],
                                 s, 8)

        params, opt_state = fleet.init()
        p1, o1 = exp.init(jax.random.PRNGKey(1))
        for a, b in zip(jax.tree.leaves(jax.tree.map(lambda x: x[1], params)),
                        jax.tree.leaves(p1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        p2, o2, losses = fleet.train_epoch_segno(
            params, opt_state, arrays, jnp.asarray(perms), frames, in_steps)

        p1b, _, losses1 = exp.train_epoch(p1, o1, arrays,
                                          jnp.asarray(perms[1]), frames,
                                          in_steps)
        np.testing.assert_allclose(np.asarray(losses[1]), np.asarray(losses1),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(jax.tree.map(lambda x: x[1], p2)),
                        jax.tree.leaves(p1b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


@pytest.mark.slow
class TestCompactionBitStability:
    """RESULTS.md claims compaction timing (fleet recompilation at a
    different surviving-seed count) leaves every PRE-compaction statistic
    bit-identical and only perturbs long-surviving seeds' later
    trajectories at ULP level. Pin the first half of that claim with a
    controlled experiment instead of one ledger diff."""

    def _setup(self):
        from nonode_tpu.models.egno import EGNO
        from nonode_tpu.parallel.fleet import SeedFleet
        from nonode_tpu.train.loop import EGNOExperiment

        model = EGNO(n_layers=1, hidden_nf=8, num_timesteps=3,
                     time_emb_dim=4, num_modes=2)
        exp = EGNOExperiment(model, lr=1e-3)
        fleet = SeedFleet(exp, seeds=[0, 1, 2])
        s, n, t = 32, 4, 3
        rng = np.random.RandomState(0)
        loc = jnp.asarray(rng.randn(s, 20, n, 3), jnp.float32)
        vel = jnp.asarray(rng.randn(s, 20, n, 3), jnp.float32)
        charges = jnp.asarray(rng.choice([-1.0, 1.0], (s, n, 1)), jnp.float32)
        w = jnp.einsum("sik,sjk->sij", charges, charges)[..., None]
        out_frames = np.broadcast_to(np.arange(11, 11 + t), (s, t)).copy()
        idx = {
            "frames_in": jnp.full((s, 1), 10, jnp.int32),
            "t_in": jnp.zeros((s, 1), jnp.float32),
            "out_frames": jnp.asarray(out_frames.astype(np.int32)),
            "t_out": jnp.asarray((out_frames - 10).astype(np.float32)),
        }
        return fleet, (loc, vel, charges, w), idx, s

    def _run(self, compact_at, epochs=6):
        """Train the 3-seed fleet; at epoch `compact_at` force seed 2 out
        (fleet.take on [0, 1] — exactly what the driver does when a seed
        early-stops). Returns per-epoch per-seed losses [E, 3] with NaN
        after removal."""
        fleet, arrays, idx, s = self._setup()
        params, opt_state = fleet.init()
        alive = np.arange(3)
        perm_rngs = [np.random.RandomState(s_) for s_ in range(3)]
        hist = np.full((epochs, 3), np.nan)
        for ep in range(epochs):
            perms = jnp.asarray(fleet.make_perms(
                [perm_rngs[i] for i in alive], s, 8))
            params, opt_state, losses, _ = fleet.train_epoch(
                params, opt_state, arrays, idx, perms)
            hist[ep, alive] = np.asarray(losses).mean(axis=1)
            if ep == compact_at:
                keep = np.array([0, 1])
                params = fleet.take(params, keep)
                opt_state = fleet.take(opt_state, keep)
                alive = alive[keep]
        return hist

    def test_pre_compaction_stats_bit_identical(self):
        """Compacting at epoch 2 vs epoch 4 vs never: every statistic
        recorded BEFORE the earlier compaction point must be bit-identical
        across the three runs, and the survivors' post-compaction
        trajectories must agree to ULP-level tolerance (the documented
        residual: recompiling at K=2 re-orders fp32 reductions)."""
        h2 = self._run(compact_at=2)
        h4 = self._run(compact_at=4)
        hn = self._run(compact_at=10**9)   # never compacts

        # epochs 0..2 ran identically (same K=3 program) in all runs
        np.testing.assert_array_equal(h2[:3], h4[:3])
        np.testing.assert_array_equal(h2[:3], hn[:3])
        # seed 2's full pre-removal history in the early-compaction run
        # bit-matches the never-compacted run
        np.testing.assert_array_equal(h2[:3, 2], hn[:3, 2])
        # survivors after the early compaction: ULP-level only
        np.testing.assert_allclose(h2[3:, :2], hn[3:, :2],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(h4[5:, :2], hn[5:, :2],
                                   rtol=1e-5, atol=1e-7)
        assert np.isnan(h2[3:, 2]).all() and np.isnan(h4[5:, 2]).all()
