"""Simulator tests: shapes, energy conservation oracle, batch==single
equivalence (the reference's own test pattern, synthetic_sim.py:485-553),
and force-law cross-checks against independent NumPy math."""

import jax
import jax.numpy as jnp
import numpy as np

from nonode_tpu.sim.simulators import ChargedSim, GravitySim, SpringSim, sample_batch


class TestCharged:
    def test_shapes(self):
        sim = ChargedSim(n_balls=5)
        loc, vel, edges, charges = sim.sample_trajectory(
            jax.random.PRNGKey(0), T=1000, sample_freq=100)
        assert loc.shape == (9, 5, 3)       # T/freq - 1 frames
        assert vel.shape == (9, 5, 3)
        assert edges.shape == (5, 5)
        assert charges.shape == (5, 1)

    def test_force_law_vs_numpy(self):
        sim = ChargedSim(n_balls=4)
        rng = np.random.RandomState(0)
        loc = rng.randn(4, 3).astype(np.float32)
        q = rng.choice([-1.0, 1.0], size=(4, 1)).astype(np.float32)
        edges = q @ q.T
        got = np.asarray(sim._force(jnp.asarray(loc), jnp.asarray(edges)))
        want = np.zeros((4, 3), np.float32)
        for i in range(4):
            for j in range(4):
                if i != j:
                    r = loc[i] - loc[j]
                    d3 = (r @ r) ** 1.5
                    want[i] += edges[i, j] * r / d3
        want = np.clip(want, -sim._max_f, sim._max_f)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_energy_conservation(self):
        sim = ChargedSim(n_balls=5)
        loc, vel, edges, _ = sim.sample_trajectory(
            jax.random.PRNGKey(1), T=5000, sample_freq=100)
        e = jnp.stack([sim.energy(loc[i], vel[i], edges)
                       for i in range(loc.shape[0])])
        # normalize by the kinetic-energy scale: E0 itself can be a near
        # cancellation of K and U, which inflates relative drift. Close
        # encounters make the (reference-identical) integrator drift, so this
        # is a loose sanity bound — blow-ups are what it catches.
        k_scale = float(0.5 * (vel[0] ** 2).sum())
        drift = jnp.abs(e - e[0]) / max(k_scale, 1e-6)
        assert float(drift.max()) < 0.5, f"energy drift too large: {drift.max()}"

    def test_momentum_conservation(self):
        """The pairwise force is antisymmetric -> total momentum is conserved
        exactly (up to clipping, which is inactive in typical runs)."""
        sim = ChargedSim(n_balls=5)
        loc, vel, edges, _ = sim.sample_trajectory(
            jax.random.PRNGKey(1), T=5000, sample_freq=100)
        mom = np.asarray(vel.sum(axis=1))  # equal masses
        drift = np.abs(mom - mom[0]).max()
        assert drift < 1e-3, f"momentum drift: {drift}"

    def test_charges_are_pm1(self):
        sim = ChargedSim(n_balls=10)
        _, _, _, charges = sim.sample_trajectory(
            jax.random.PRNGKey(2), T=200, sample_freq=100)
        assert set(np.unique(np.asarray(charges))) <= {-1.0, 1.0}


class TestGravity:
    def test_shapes_includes_initial_frame(self):
        sim = GravitySim(n_balls=8)
        pos, vel, force, mass = sim.sample_trajectory(
            jax.random.PRNGKey(0), T=1000, sample_freq=100)
        assert pos.shape == (10, 8, 3)       # T/freq frames, incl. t=0
        assert force.shape == (10, 8, 3)
        assert mass.shape == (8, 1)
        assert (np.asarray(mass) > 0).all()

    def test_accel_vs_numpy(self):
        sim = GravitySim(n_balls=6)
        rng = np.random.RandomState(1)
        pos = rng.randn(6, 3).astype(np.float32)
        mass = (1.0 + 0.1 * rng.randn(6, 1)).astype(np.float32)
        got = np.asarray(sim._accel(jnp.asarray(pos), jnp.asarray(mass)))
        want = np.zeros((6, 3), np.float32)
        for i in range(6):
            for j in range(6):
                d = pos[j] - pos[i]
                inv_r3 = (d @ d + sim.softening ** 2) ** -1.5
                want[i] += d * inv_r3 * mass[j, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_energy_conservation(self):
        """Leapfrog energy error spikes during close encounters but recovers;
        endpoint drift must stay small relative to the kinetic scale."""
        sim = GravitySim(n_balls=5)
        pos, vel, _, mass = sim.sample_trajectory(
            jax.random.PRNGKey(1), T=2000, sample_freq=100)
        e = jnp.stack([sim.energy(pos[i], vel[i], mass)
                       for i in range(pos.shape[0])])
        ke0 = float(0.5 * (mass * vel[0] ** 2).sum())
        assert abs(float(e[-1] - e[0])) / ke0 < 0.01

    def test_momentum_conservation(self):
        sim = GravitySim(n_balls=5)
        _, vel, _, mass = sim.sample_trajectory(
            jax.random.PRNGKey(1), T=2000, sample_freq=100)
        mom = np.asarray((mass * vel).sum(axis=1))
        assert np.abs(mom - mom[0]).max() < 1e-4

    def test_com_frame(self):
        sim = GravitySim(n_balls=20)
        pos, vel, _, mass = sim.sample_trajectory(
            jax.random.PRNGKey(3), T=100, sample_freq=100)
        p0 = (np.asarray(mass) * np.asarray(vel[0])).sum(0)
        np.testing.assert_allclose(p0, np.zeros(3), atol=1e-3)


class TestSpring:
    def test_energy_conservation(self):
        sim = SpringSim(n_balls=5)
        loc, vel, edges, _ = sim.sample_trajectory(
            jax.random.PRNGKey(0), T=5000, sample_freq=100)
        e = jnp.stack([sim.energy(loc[i], vel[i], edges)
                       for i in range(loc.shape[0])])
        drift = jnp.abs((e - e[0]) / (e[0] + 1e-10))
        assert float(drift.max()) < 0.05

    def test_edges_symmetric(self):
        sim = SpringSim(n_balls=6)
        _, _, edges, _ = sim.sample_trajectory(
            jax.random.PRNGKey(1), T=200, sample_freq=100)
        np.testing.assert_allclose(edges, edges.T, atol=0)
        assert float(jnp.diag(edges).max()) == 0.0


class TestBatch:
    def test_vmap_matches_single(self):
        """vmap-ed sampling must bit-match per-key single sampling — the
        reference's batch/single equivalence invariant."""
        sim = GravitySim(n_balls=5)
        key = jax.random.PRNGKey(42)
        pos_b, vel_b, force_b, mass_b = sample_batch(sim, key, 3, 500, 100)
        keys = jax.random.split(key, 3)
        for i in range(3):
            pos_s, vel_s, force_s, mass_s = sim.sample_trajectory(
                keys[i], T=500, sample_freq=100)
            np.testing.assert_array_equal(np.asarray(pos_b[i]), np.asarray(pos_s))
            np.testing.assert_array_equal(np.asarray(mass_b[i]), np.asarray(mass_s))


class TestObservationNoise:
    def test_noise_var_applied_and_zero_path_unchanged(self):
        """noise_var adds randn*noise_var observation noise to the SAVED
        trajectories (synthetic_sim.py:293-295); noise_var=0 draws nothing
        and stays bit-identical to the pre-noise stream."""
        from nonode_tpu.sim.simulators import ChargedSim
        key = jax.random.PRNGKey(0)
        clean = ChargedSim(n_balls=5).sample_trajectory(key, 1000, 100)
        noisy = ChargedSim(n_balls=5, noise_var=0.1).sample_trajectory(
            key, 1000, 100)
        np.testing.assert_array_equal(np.asarray(clean[2]),
                                      np.asarray(noisy[2]))  # edges
        d = np.asarray(noisy[0]) - np.asarray(clean[0])
        assert 0.01 < np.abs(d).mean() < 0.5  # ~N(0, 0.1) perturbation
        clean2 = ChargedSim(n_balls=5).sample_trajectory(key, 1000, 100)
        np.testing.assert_array_equal(np.asarray(clean[0]),
                                      np.asarray(clean2[0]))


class TestGenerateSpringsQuirk:
    def test_springs_ignores_initial_vel(self, tmp_path):
        """The reference builds SpringSim WITHOUT vel_norm
        (generate_dataset.py:45): --initial_vel 0 must NOT shrink spring
        initial velocities to 1e-16."""
        import argparse

        from nonode_tpu.sim.generate import main as gen_main
        args = argparse.Namespace(
            simulation="springs", num_train=2, num_valid=2, num_test=2,
            length=600, length_test=600, sample_freq=100, n_balls=5,
            seed=1, initial_vel=0, suffix="tiny", outdir=tmp_path, chunk=500)
        gen_main(args)
        vel = np.load(tmp_path / "vel_train_springs5_initvel0tiny.npy")
        # [S, T, 3, N]; first recorded frame keeps an O(0.5)-norm velocity
        norms = np.linalg.norm(vel[:, 0], axis=1)
        assert norms.mean() > 0.05, norms.mean()
