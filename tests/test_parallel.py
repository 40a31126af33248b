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
