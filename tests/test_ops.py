"""Unit tests: dense aggregation semantics, EGNN/SEGNO layer invariances,
spectral conv vs direct DFT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonode_tpu.ops.dense_graph import (
    EGNNLayer, SEGNOGCL, masked_mean_j, masked_sum_j, offdiag_mask,
    pairwise_diff)
from nonode_tpu.ops.spectral import SpectralConv, TimeConv, TimeConvX, timestep_embedding


def rand_rotation(seed=0):
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return jnp.asarray(q, dtype=jnp.float32)


class TestAggregation:
    def test_masked_sum_matches_edge_list(self):
        n, k = 5, 4
        rng = np.random.RandomState(0)
        m = rng.randn(n, n, k).astype(np.float32)
        mask = offdiag_mask(n)
        got = masked_sum_j(jnp.asarray(m), mask)
        want = np.zeros((n, k), np.float32)
        for i in range(n):
            for j in range(n):
                if i != j:
                    want[i] += m[i, j]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_masked_mean_divides_by_degree(self):
        n, k = 6, 3
        m = jnp.ones((n, n, k))
        mask = offdiag_mask(n)
        np.testing.assert_allclose(masked_mean_j(m, mask), np.ones((n, k)),
                                   rtol=1e-6)

    def test_pairwise_diff_orientation(self):
        x = jnp.asarray(np.random.RandomState(1).randn(4, 3), jnp.float32)
        d = pairwise_diff(x)
        np.testing.assert_allclose(d[1, 2], x[1] - x[2], rtol=1e-6)


class TestEGNNLayer:
    def _setup(self, n=5, h_dim=16, with_v=True, seed=0):
        layer = EGNNLayer(hidden_nf=h_dim, in_edge_nf=2, with_v=with_v)
        key = jax.random.PRNGKey(seed)
        p = layer.init(key)
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(n, 3), jnp.float32)
        h = jnp.asarray(rng.randn(n, h_dim), jnp.float32)
        e = jnp.asarray(rng.randn(n, n, 2), jnp.float32)
        v = jnp.asarray(rng.randn(n, 3), jnp.float32)
        return layer, p, x, h, e, v

    def test_rotation_equivariance(self):
        layer, p, x, h, e, v = self._setup()
        r = rand_rotation()
        x1, v1, h1 = layer(p, x, h, e, v)
        x2, v2, h2 = layer(p, x @ r, h, e, v @ r)
        np.testing.assert_allclose(x2, x1 @ r, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(v2, v1 @ r, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(h2, h1, rtol=1e-4, atol=1e-5)

    def test_translation_equivariance(self):
        layer, p, x, h, e, v = self._setup()
        t = jnp.asarray([1.5, -2.0, 0.3])
        x1, _, h1 = layer(p, x, h, e, v)
        x2, _, h2 = layer(p, x + t, h, e, v)
        np.testing.assert_allclose(x2, x1 + t, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(h2, h1, rtol=1e-4, atol=1e-5)

    def test_batch_dims(self):
        layer, p, x, h, e, v = self._setup()
        xb = jnp.stack([x, x + 1.0])
        hb = jnp.stack([h, h])
        eb = jnp.stack([e, e])
        vb = jnp.stack([v, v])
        xo, vo, ho = layer(p, xb, hb, eb, vb)
        x1, v1, h1 = layer(p, x, h, e, v)
        np.testing.assert_allclose(xo[0], x1, rtol=1e-5, atol=1e-6)
        assert xo.shape == (2, 5, 3)

    def test_permutation_equivariance(self):
        layer, p, x, h, e, v = self._setup()
        perm = np.array([2, 0, 4, 1, 3])
        x1, _, h1 = layer(p, x, h, e, v)
        x2, _, h2 = layer(p, x[perm], h[perm], e[perm][:, perm], v[perm])
        np.testing.assert_allclose(x2, x1[perm], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(h2, h1[perm], rtol=1e-4, atol=1e-5)


class TestSEGNOGCL:
    def test_rotation_equivariance(self):
        n, hd = 5, 16
        gcl = SEGNOGCL(hidden_nf=hd, in_edge_nf=2)
        p = gcl.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n, 3), jnp.float32)
        h = jnp.asarray(rng.randn(n, hd), jnp.float32)
        e = jnp.asarray(rng.randn(n, n, 2), jnp.float32)
        v = jnp.asarray(rng.randn(n, 3), jnp.float32)
        r = rand_rotation(3)
        h1, x1, v1 = gcl(p, h, x, v, e, 0.1)
        h2, x2, v2 = gcl(p, h, x @ r, v @ r, e, 0.1)
        np.testing.assert_allclose(x2, x1 @ r, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(v2, v1 @ r, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(h2, h1, rtol=1e-4, atol=1e-5)

    def test_coords_range_is_constant_not_param(self):
        """The reference's `nn.Parameter(torch.ones(1))*3` (gcl.py:59) is a
        plain product — an UNREGISTERED constant, never in parameters() or
        state_dict, never trained. It must not appear in the params pytree
        (or adam/weight-decay would update it) and the tanh path scales by
        the fixed 3.0."""
        n, hd = 4, 8
        gcl = SEGNOGCL(hidden_nf=hd, in_edge_nf=0, tanh=True)
        p = gcl.init(jax.random.PRNGKey(0))
        assert "coords_range" not in p
        e = jnp.asarray(np.random.RandomState(0).randn(n, hd), jnp.float32)
        y = gcl._coord_mlp(p, e)
        assert float(jnp.abs(y).max()) <= 3.0 + 1e-6

    def test_second_order_update(self):
        """v' = v + agg/T and x' = x + v'/T: with zero force MLP output the
        trajectory is straight-line drift."""
        n, hd = 4, 8
        gcl = SEGNOGCL(hidden_nf=hd, in_edge_nf=0)
        p = gcl.init(jax.random.PRNGKey(1))
        # zero the coord net's final layer -> zero acceleration
        p["coord_mlp_l2"]["w"] = jnp.zeros_like(p["coord_mlp_l2"]["w"])
        p["coord_mlp_l2"]["b"] = jnp.zeros_like(p["coord_mlp_l2"]["b"])
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(n, 3), jnp.float32)
        h = jnp.asarray(rng.randn(n, hd), jnp.float32)
        v = jnp.asarray(rng.randn(n, 3), jnp.float32)
        e = jnp.zeros((n, n, 0))
        _, x1, v1 = gcl(p, h, x, v, e, 0.5)
        np.testing.assert_allclose(v1, v, rtol=1e-6)
        np.testing.assert_allclose(x1, x + v * 0.5, rtol=1e-5)


class TestSpectral:
    def test_spectral_conv_matches_direct_dft(self):
        t, n, ci, co, modes = 10, 7, 4, 4, 3
        conv = SpectralConv(ci, co, modes)
        p = conv.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        x = rng.randn(t, n, ci).astype(np.float32)
        got = np.asarray(conv(p, jnp.asarray(x)))

        xf = np.fft.rfft(x, axis=0)[:modes]
        w = np.asarray(p["w"][..., 0] + 1j * p["w"][..., 1])
        of = np.einsum("mni,iom->mno", xf, w)
        full = np.zeros((t // 2 + 1, n, co), complex)
        full[:modes] = of
        want = np.fft.irfft(full, n=t, axis=0).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_time_conv_residual(self):
        conv = TimeConv(8, 2)
        p = conv.init(jax.random.PRNGKey(0))
        p = jax.tree.map(jnp.zeros_like, p)
        x = jnp.asarray(np.random.RandomState(0).randn(6, 3, 8), jnp.float32)
        np.testing.assert_allclose(conv(p, x), x, atol=1e-6)

    def test_time_conv_x_equivariance(self):
        """The (x-xm, v) conv is linear over the 3D axis -> rotation equivariant."""
        conv = TimeConvX(2, 2)
        p = conv.init(jax.random.PRNGKey(1))
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(6, 5, 3, 2), jnp.float32)
        r = rand_rotation(7)
        y1 = conv(p, x)
        xr = jnp.einsum("tndc,de->tnec", x, r)
        y2 = conv(p, xr)
        np.testing.assert_allclose(y2, jnp.einsum("tndc,de->tnec", y1, r),
                                   rtol=1e-4, atol=1e-5)

    def test_timestep_embedding_shape_and_values(self):
        ts = jnp.asarray([[0.0, 1.0, 2.0]])
        emb = timestep_embedding(ts, 8)
        assert emb.shape == (1, 3, 8)
        # t=0: sin terms are 0, cos terms are 1
        np.testing.assert_allclose(emb[0, 0, :4], np.zeros(4), atol=1e-6)
        np.testing.assert_allclose(emb[0, 0, 4:], np.ones(4), atol=1e-6)
        # nonzero t against the closed form (pins the frequency base 10000
        # — t=0 alone is base-independent)
        import math
        freqs = np.exp(np.arange(4) * -(math.log(10000) / 3))
        np.testing.assert_allclose(emb[0, 2, :4], np.sin(2.0 * freqs),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(emb[0, 2, 4:], np.cos(2.0 * freqs),
                                   rtol=1e-5, atol=1e-6)
