"""Baseline model-zoo tests: shapes + equivariance properties."""

import jax
import jax.numpy as jnp
import numpy as np

from nonode_tpu.models.baselines import (EGMN, EquivariantScalarNet, FullMLP,
                                         GNN, LinearDynamics, RFVel)
from tests.test_ops import rand_rotation


class TestGNN:
    def test_forward(self):
        m = GNN(n_layers=2, in_node_nf=3, in_edge_nf=2, hidden_nf=16)
        p = m.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        h = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
        e = jnp.asarray(rng.randn(2, 5, 5, 2), jnp.float32)
        out = m(p, h, e)
        assert out.shape == (2, 5, 3)


class TestLinearDynamics:
    def test_drift(self):
        m = LinearDynamics()
        p = m.init(jax.random.PRNGKey(0))
        x = jnp.ones((3, 3))
        v = jnp.full((3, 3), 2.0)
        np.testing.assert_allclose(m(p, x, v), x + v, atol=1e-6)


class TestRFVel:
    def test_rotation_equivariance(self):
        m = RFVel(hidden_nf=16, edge_attr_nf=1, n_layers=2)
        p = m.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 3), jnp.float32)
        v = jnp.asarray(rng.randn(4, 3), jnp.float32)
        vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
        e = jnp.asarray(rng.randn(4, 4, 1), jnp.float32)
        r = rand_rotation(5)
        x1 = m(p, vn, x, v, e)
        x2 = m(p, vn, x @ r, v @ r, e)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x1 @ r),
                                   rtol=1e-4, atol=1e-5)


class TestFullMLP:
    def test_forward(self):
        m = FullMLP(in_node_nf=6, hidden_nf=16, n_layers=2)
        p = m.init(jax.random.PRNGKey(0))
        out = m(p, jnp.ones((3, 6)))
        assert out.shape == (3, 3)


class TestEquivariantScalarNet:
    def test_equivariance(self):
        m = EquivariantScalarNet(n_vector_input=2, hidden_dim=16,
                                 n_scalar_input=3)
        p = m.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        v1 = jnp.asarray(rng.randn(6, 3), jnp.float32)
        v2 = jnp.asarray(rng.randn(6, 3), jnp.float32)
        s = jnp.asarray(rng.randn(6, 3), jnp.float32)
        r = rand_rotation(2)
        vec1, sc1 = m(p, [v1, v2], s)
        vec2, sc2 = m(p, [v1 @ r, v2 @ r], s)
        np.testing.assert_allclose(np.asarray(vec2), np.asarray(vec1 @ r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sc2), np.asarray(sc1),
                                   rtol=1e-4, atol=1e-5)


class TestEGMN:
    def test_growing_basis(self):
        m = EGMN(n_layers=3, n_vector_input=2, hidden_dim=8, n_scalar_input=4)
        p = m.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        v1 = jnp.asarray(rng.randn(5, 3), jnp.float32)
        v2 = jnp.asarray(rng.randn(5, 3), jnp.float32)
        s = jnp.asarray(rng.randn(5, 4), jnp.float32)
        vec, sc = m(p, [v1, v2], s)
        assert vec.shape == (5, 3)
        assert sc.shape == (5, 8)
