"""Fused Pallas pairwise kernel vs the dense XLA path (fwd + grads).

The fused kernel (ops/pallas/egnn_fused.py) must be a drop-in for the dense
EGNNLayer / SEGNOGCL pairwise chain: identical outputs and identical
gradients (it carries a hand-written VJP with in-kernel recompute). Runs in
Pallas interpret mode on the CPU test platform."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonode_tpu.ops.dense_graph import EGNNLayer, SEGNOGCL, offdiag_mask

pytestmark = pytest.mark.slow  # multi-minute tier; quick: -m 'not slow'

H = 32
E = 2


def _egnn_inputs(key, lead, n):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (*lead, n, 3))
    h = jax.random.normal(ks[1], (*lead, n, H))
    v = jax.random.normal(ks[2], (*lead, n, 3))
    efea = jax.random.normal(ks[3], (*lead, n, n, E))
    efea = 0.5 * (efea + jnp.swapaxes(efea, -2, -3))
    return x, h, v, efea


def _loss_fn(layer, cot):
    def loss(params, x, h, efea, v):
        xo, vo, ho = layer(params, x, h, efea, v=v)
        return (xo * cot[0]).sum() + (ho * cot[1]).sum()
    return loss


class TestFusedEGNN:
    @pytest.mark.parametrize("lead", [(6,), (3, 4)])
    def test_forward_and_grads_match_dense(self, lead):
        n = 5
        dense = EGNNLayer(H, E, with_v=True)
        fused = dataclasses.replace(dense, fused=True)
        params = dense.init(jax.random.PRNGKey(0))
        x, h, v, efea = _egnn_inputs(jax.random.PRNGKey(1), lead, n)

        xd, vd, hd = dense(params, x, h, efea, v=v)
        xf, vf, hf = fused(params, x, h, efea, v=v)
        np.testing.assert_allclose(xf, xd, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(hf, hd, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(vf, vd, rtol=0, atol=0)

        cot = (jax.random.normal(jax.random.PRNGKey(2), xd.shape),
               jax.random.normal(jax.random.PRNGKey(3), hd.shape))
        gd = jax.grad(_loss_fn(dense, cot), argnums=(0, 1, 2, 3, 4))(
            params, x, h, efea, v)
        gf = jax.grad(_loss_fn(fused, cot), argnums=(0, 1, 2, 3, 4))(
            params, x, h, efea, v)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gd)):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def test_post_mean_clip_engages(self):
        """Scale the coord head so masked-mean forces exceed +-100: the
        fused path must clip identically (clip lives outside the kernel)."""
        n = 4
        dense = EGNNLayer(H, E, with_v=False)
        fused = dataclasses.replace(dense, fused=True)
        params = dense.init(jax.random.PRNGKey(0))
        params["coord_net"]["l2"]["w"] = params["coord_net"]["l2"]["w"] * 1e4
        x, h, _, efea = _egnn_inputs(jax.random.PRNGKey(1), (8,), n)
        xd, _, hd = dense(params, x, h, efea)
        xf, _, hf = fused(params, x, h, efea)
        assert np.abs(np.asarray(xd - x)).max() >= 100.0 - 1e-3
        np.testing.assert_allclose(xf, xd, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(hf, hd, rtol=1e-5, atol=1e-5)

    def test_edge_mask(self):
        """Static [N,N] adjacency (mocap-style), incl. an isolated node to
        exercise the degree clamp."""
        n = 6
        rng = np.random.RandomState(0)
        adj = (rng.rand(n, n) < 0.5).astype(np.float32)
        adj = np.maximum(adj, adj.T)
        adj[5, :] = 0.0
        adj[:, 5] = 0.0
        adj = jnp.asarray(adj * (1 - np.eye(n, dtype=np.float32)))

        dense = EGNNLayer(H, E, with_v=True)
        fused = dataclasses.replace(dense, fused=True)
        params = dense.init(jax.random.PRNGKey(0))
        x, h, v, efea = _egnn_inputs(jax.random.PRNGKey(1), (7,), n)
        xd, _, hd = dense(params, x, h, efea, v=v, edge_mask=adj)
        xf, _, hf = fused(params, x, h, efea, v=v, edge_mask=adj)
        np.testing.assert_allclose(xf, xd, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(hf, hd, rtol=1e-5, atol=1e-5)

    def test_fallback_configs_use_dense(self):
        """Unsupported configs must silently take the dense path."""
        layer = EGNNLayer(H, E, flat=True, fused=True)   # tanh/4x hidden
        assert not layer._use_fused(jnp.zeros((2, 5, 3)), None)
        layer = EGNNLayer(H, E, norm=True, fused=True)
        assert not layer._use_fused(jnp.zeros((2, 5, 3)), None)
        layer = EGNNLayer(H, E, fused=True)
        assert not layer._use_fused(jnp.zeros((2, 5, 3), jnp.bfloat16), None)
        assert not layer._use_fused(jnp.zeros((2, 70, 3)), None)  # N^2 VMEM


class TestFusedSEGNO:
    def test_forward_and_grads_match_dense(self):
        n = 5
        dense = SEGNOGCL(H, in_edge_nf=E, coords_weight=0.7)
        fused = dataclasses.replace(dense, fused=True)
        params = dense.init(jax.random.PRNGKey(0))
        x, h, v, eattr = _egnn_inputs(jax.random.PRNGKey(1), (6,), n)

        hd, xd, vd = dense(params, h, x, v, eattr, 0.125)
        hf, xf, vf = fused(params, h, x, v, eattr, 0.125)
        np.testing.assert_allclose(xf, xd, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(hf, hd, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(vf, vd, rtol=1e-5, atol=1e-5)

        cot = (jax.random.normal(jax.random.PRNGKey(2), xd.shape),
               jax.random.normal(jax.random.PRNGKey(3), hd.shape),
               jax.random.normal(jax.random.PRNGKey(4), vd.shape))

        def loss(layer):
            def f(params, x, h, v, eattr):
                ho, xo, vo = layer(params, h, x, v, eattr, 0.125)
                return ((xo * cot[0]).sum() + (ho * cot[1]).sum()
                        + (vo * cot[2]).sum())
            return f

        gd = jax.grad(loss(dense), argnums=(0, 1, 2, 3, 4))(
            params, x, h, v, eattr)
        gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(
            params, x, h, v, eattr)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gd)):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def test_per_edge_clip_engages(self):
        """SEGNO clips per edge BEFORE the mean (gcl.py:100): inflate the
        coord head so some edges clip, and check values + grads still match
        (the clip gate lives inside the fused bwd kernel)."""
        n = 5
        dense = SEGNOGCL(H, in_edge_nf=E)
        fused = dataclasses.replace(dense, fused=True)
        params = dense.init(jax.random.PRNGKey(0))
        params["coord_mlp_l2"]["w"] = params["coord_mlp_l2"]["w"] * 1e6
        x, h, v, eattr = _egnn_inputs(jax.random.PRNGKey(1), (6,), n)

        hd, xd, vd = dense(params, h, x, v, eattr, 0.125)
        hf, xf, vf = fused(params, h, x, v, eattr, 0.125)
        np.testing.assert_allclose(xf, xd, rtol=1e-5, atol=1e-4)

        def loss(layer):
            def f(params):
                ho, xo, vo = layer(params, h, x, v, eattr, 0.125)
                return (xo ** 2).sum() + (ho ** 2).sum()
            return f

        gd = jax.grad(loss(dense))(params)
        gf = jax.grad(loss(fused))(params)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gd)):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-4)
