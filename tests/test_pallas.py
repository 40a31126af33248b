"""Pallas pairwise-kernel tests (interpret mode on CPU; the same kernels are
compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonode_tpu.ops.pallas.pairwise import (charged_force, gravity_accel,
                                            pairwise_accel_reference)

INTERPRET = jax.default_backend() != "tpu"


class TestGravityKernel:
    @pytest.mark.parametrize("n", [100, 256, 1000])
    def test_matches_dense(self, n):
        rng = np.random.RandomState(0)
        pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
        mass = jnp.asarray(1 + 0.1 * rng.randn(n), jnp.float32)
        got = gravity_accel(pos, mass, interpret=INTERPRET)
        want = pairwise_accel_reference(pos, mass)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5 * scale, rtol=1e-4)

    def test_matches_simulator_accel(self):
        from nonode_tpu.sim.simulators import GravitySim
        sim = GravitySim(n_balls=200)
        rng = np.random.RandomState(1)
        pos = jnp.asarray(rng.randn(200, 3), jnp.float32)
        mass = jnp.asarray(1 + 0.1 * rng.randn(200, 1), jnp.float32)
        got = gravity_accel(pos, mass, interpret=INTERPRET)
        want = sim._accel(pos, mass)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5 * scale, rtol=1e-4)


class TestChargedKernel:
    @pytest.mark.parametrize("n", [64, 300])
    def test_matches_dense(self, n):
        rng = np.random.RandomState(0)
        pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
        q = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
        got = charged_force(pos, q, interpret=INTERPRET)
        diff = pos[:, None, :] - pos[None, :, :]
        r2 = (diff * diff).sum(-1)
        inv = jnp.where(r2 > 0, r2 ** -1.5, 0.0) * (1 - jnp.eye(n))
        w = q[:, None] * q[None, :] * inv
        want = jnp.clip((w[..., None] * diff).sum(1), -100, 100)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4 * scale, rtol=1e-3)

    def test_padding_does_not_leak(self):
        """Non-multiple-of-128 N: padded phantom particles contribute 0."""
        rng = np.random.RandomState(2)
        n = 130
        pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
        q = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
        full = charged_force(pos, q, interpret=INTERPRET)
        sub = charged_force(pos[:128], q[:128], interpret=INTERPRET)
        # removing particles changes forces; but running the same 130 through
        # a differently-padded size must not
        full2 = charged_force(jnp.concatenate([pos, pos[:1] * 0 + 99.0]),
                              jnp.concatenate([q, jnp.zeros(1)]),
                              interpret=INTERPRET)[:n]
        np.testing.assert_allclose(np.asarray(full), np.asarray(full2),
                                   atol=1e-5)
        assert not np.allclose(np.asarray(full[:128]), np.asarray(sub))


class TestTailBlockCoverage:
    @pytest.mark.parametrize("n,block_i", [(250, 100), (300, 129), (131, 64)])
    def test_non_dividing_block_size_covers_all_receivers(self, n, block_i):
        """block_i values that don't divide the padded width must not drop
        the tail block (regression: np_ was rounded to a multiple of 128
        only, grid = np_ // bi truncated, and the last receivers returned
        uninitialized rows)."""
        rng = np.random.RandomState(0)
        pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
        mass = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)
        got = gravity_accel(pos, mass, block_i=block_i, interpret=INTERPRET)
        want = pairwise_accel_reference(pos, mass)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        q = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
        f = charged_force(pos, q, block_i=block_i, interpret=INTERPRET)
        assert np.isfinite(np.asarray(f)).all()
