"""N-body physics simulators as on-device JAX programs.

Behavioral parity with the NumPy reference (synthetic_sim.py): same
integrators, force laws, clipping, sampling cadence, and output layouts —
but the time loop is ``lax.scan``, the batch is ``vmap``, and the whole
dataset generation runs jitted on the accelerator. This replaces the
reference's 20000-iteration Python loops (synthetic_sim.py:266-292) and is
the primary datagen throughput win.

Sampling cadences (exact parity):
- Charged/Spring (synthetic_sim.py:220-296, :74-146): one pre-loop full-dt
  velocity kick; per micro-step: drift, (record), force, kick. Records land
  at micro-steps freq, 2*freq, ..., giving T/freq - 1 frames of
  (loc after drift, vel before kick). The initial state is NOT saved (the
  reference's loc[0] is overwritten by the first record).
- Gravity (synthetic_sim.py:360-404): leapfrog kick-drift-kick; records the
  state (pos, vel, force=acc*mass) BEFORE each block of freq KDK steps,
  giving T/freq frames including the initial state.

Energy functions mirror the reference definitions used as conservation
oracles (synthetic_sim.py:179-193, :335-358, :21-34).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


def _pairwise(loc):
    """loc: [N, 3] -> diff[i, j] = x_i - x_j, r2[i, j]."""
    diff = loc[:, None, :] - loc[None, :, :]
    r2 = (diff * diff).sum(-1)
    return diff, r2


def _obs_noise(key, noise_var, *arrays):
    """Observation noise on the saved trajectories (synthetic_sim.py:144-145,
    :293-295, :400-403: saved arrays += randn * noise_var). Python-level
    gate: the noise_var=0 path draws nothing, keeping existing streams
    bit-identical; the noise key is fold_in-derived so the init-state
    stream is untouched either way."""
    if not noise_var:
        return arrays
    ks = jax.random.split(jax.random.fold_in(key, 0x6E6F6973), len(arrays))
    return tuple(a + noise_var * jax.random.normal(k, a.shape, a.dtype)
                 for k, a in zip(ks, arrays))


@dataclasses.dataclass(frozen=True)
class ChargedSim:
    """Coulomb-interacting particles; leapfrog with per-component force clip."""

    n_balls: int = 5
    box_size: float = 5.0
    loc_std: float = 1.0
    vel_norm: float = 0.5
    interaction_strength: float = 1.0
    noise_var: float = 0.0
    dt: float = 0.001

    @property
    def _loc_std(self) -> float:
        # reference scales loc_std with particle count (synthetic_sim.py:155)
        return self.loc_std * (float(self.n_balls) / 5.0) ** (1.0 / 3.0)

    @property
    def _max_f(self) -> float:
        return 0.1 / self.dt

    def _force(self, loc, edges):
        """F_i = k * sum_j q_i q_j (x_i - x_j) / |r_ij|^3, clipped per component."""
        diff, r2 = _pairwise(loc)
        inv_r3 = jnp.where(r2 > 0, r2 ** (-1.5), 0.0)
        fs = self.interaction_strength * edges * inv_r3
        fs = fs * (1.0 - jnp.eye(self.n_balls))
        f = (fs[..., None] * diff).sum(axis=1)
        return jnp.clip(f, -self._max_f, self._max_f)

    def _init_state(self, key):
        kq, kl, kv = jax.random.split(key, 3)
        charges = jax.random.choice(kq, jnp.array([-1.0, 1.0]),
                                    shape=(self.n_balls, 1))
        edges = charges @ charges.T
        loc = jax.random.normal(kl, (self.n_balls, 3)) * self._loc_std
        vel = jax.random.normal(kv, (self.n_balls, 3))
        vel = vel * self.vel_norm / jnp.linalg.norm(vel, axis=-1, keepdims=True)
        loc, vel = _clamp_walls(loc, vel, self.box_size)
        return loc, vel, edges, charges

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def sample_trajectory(self, key, T: int = 10000, sample_freq: int = 10):
        """Returns (loc [T/freq-1, N, 3], vel, edges [N, N], charges [N, 1])."""
        assert T % sample_freq == 0
        t_save = T // sample_freq - 1
        loc, vel, edges, charges = self._init_state(key)
        vel = vel + self.dt * self._force(loc, edges)  # pre-loop kick

        def micro(carry, _):
            loc, vel = carry
            loc = loc + self.dt * vel
            vel = vel + self.dt * self._force(loc, edges)
            return (loc, vel), None

        def block(carry, _):
            (loc, vel), _ = jax.lax.scan(micro, carry, length=sample_freq - 1)
            loc = loc + self.dt * vel
            rec = (loc, vel)  # record before this step's velocity kick
            vel = vel + self.dt * self._force(loc, edges)
            return (loc, vel), rec

        _, (locs, vels) = jax.lax.scan(block, (loc, vel), length=t_save)
        locs, vels = _obs_noise(key, self.noise_var, locs, vels)
        return locs, vels, edges, charges

    def energy(self, loc, vel, edges):
        """K + U with U = 0.5 * k * sum_{i!=j} q_i q_j / r_ij (both orders)."""
        k = 0.5 * (vel ** 2).sum()
        _, r2 = _pairwise(loc)
        dist = jnp.sqrt(r2)
        inv = jnp.where(jnp.eye(self.n_balls, dtype=bool), 0.0,
                        1.0 / jnp.where(dist == 0, jnp.inf, dist))
        u = 0.5 * self.interaction_strength * (edges * inv).sum()
        return k + u


@dataclasses.dataclass(frozen=True)
class SpringSim:
    """Hookean springs with random spring constants {0, 0.5, 1}."""

    n_balls: int = 5
    box_size: float = 5.0
    loc_std: float = 0.5
    vel_norm: float = 0.5
    interaction_strength: float = 0.1
    noise_var: float = 0.0
    dt: float = 0.001

    @property
    def _max_f(self) -> float:
        return 0.1 / self.dt

    def _force(self, loc, edges):
        diff, _ = _pairwise(loc)
        fs = -self.interaction_strength * edges * (1.0 - jnp.eye(self.n_balls))
        f = (fs[..., None] * diff).sum(axis=1)
        return jnp.clip(f, -self._max_f, self._max_f)

    def _init_state(self, key):
        ke, kl, kv = jax.random.split(key, 3)
        tri = jax.random.choice(ke, jnp.array([0.0, 1.0]),
                                shape=(self.n_balls, self.n_balls))
        edges = jnp.tril(tri) + jnp.tril(tri, -1).T
        edges = edges * (1.0 - jnp.eye(self.n_balls))
        loc = jax.random.normal(kl, (self.n_balls, 3)) * self.loc_std
        vel = jax.random.normal(kv, (self.n_balls, 3))
        vel = vel * self.vel_norm / jnp.linalg.norm(vel, axis=-1, keepdims=True)
        loc, vel = _clamp_walls(loc, vel, self.box_size)
        return loc, vel, edges, None

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def sample_trajectory(self, key, T: int = 10000, sample_freq: int = 10):
        assert T % sample_freq == 0
        t_save = T // sample_freq - 1
        loc, vel, edges, _ = self._init_state(key)
        vel = vel + self.dt * self._force(loc, edges)

        def micro(carry, _):
            loc, vel = carry
            loc = loc + self.dt * vel
            vel = vel + self.dt * self._force(loc, edges)
            return (loc, vel), None

        def block(carry, _):
            (loc, vel), _ = jax.lax.scan(micro, carry, length=sample_freq - 1)
            loc = loc + self.dt * vel
            rec = (loc, vel)
            vel = vel + self.dt * self._force(loc, edges)
            return (loc, vel), rec

        _, (locs, vels) = jax.lax.scan(block, (loc, vel), length=t_save)
        locs, vels = _obs_noise(key, self.noise_var, locs, vels)
        return locs, vels, edges, None

    def energy(self, loc, vel, edges):
        k = 0.5 * (vel ** 2).sum()
        _, r2 = _pairwise(loc)
        mask = 1.0 - jnp.eye(self.n_balls)
        u = (0.5 * self.interaction_strength * edges * r2 * mask / 2.0).sum()
        return k + u


@dataclasses.dataclass(frozen=True)
class GravitySim:
    """Softened gravity; kick-drift-kick leapfrog."""

    n_balls: int = 100
    loc_std: float = 1.0
    vel_norm: float = 0.5
    interaction_strength: float = 1.0
    noise_var: float = 0.0
    dt: float = 0.001
    softening: float = 0.1

    def _accel(self, pos, mass):
        """a_i = G * sum_j (x_j - x_i) m_j / (r^2 + eps^2)^{3/2}."""
        diff = pos[None, :, :] - pos[:, None, :]            # [i, j] = x_j - x_i
        r2 = (diff * diff).sum(-1) + self.softening ** 2
        inv_r3 = jnp.where(r2 > 0, r2 ** (-1.5), 0.0)
        return self.interaction_strength * jnp.einsum(
            "ijd,ij,j->id", diff, inv_r3, mass[:, 0],
            precision=jax.lax.Precision.HIGHEST)

    def _init_state(self, key):
        km, kp, kv = jax.random.split(key, 3)
        mass = 1.0 + jax.random.normal(km, (self.n_balls, 1)) * self.loc_std * 0.1
        pos = jax.random.normal(kp, (self.n_balls, 3))
        vel = jax.random.normal(kv, (self.n_balls, 3))
        vel = vel - (mass * vel).mean(0) / mass.mean()      # CoM frame
        return pos, vel, mass

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def sample_trajectory(self, key, T: int = 10000, sample_freq: int = 10):
        """Returns (pos [T/freq, N, 3], vel, force, mass [N, 1])."""
        assert T % sample_freq == 0
        t_save = T // sample_freq
        pos, vel, mass = self._init_state(key)
        acc = self._accel(pos, mass)

        def micro(carry, _):
            pos, vel, acc = carry
            vel = vel + acc * self.dt / 2.0
            pos = pos + vel * self.dt
            acc = self._accel(pos, mass)
            vel = vel + acc * self.dt / 2.0
            return (pos, vel, acc), None

        def block(carry, _):
            pos, vel, acc = carry
            rec = (pos, vel, acc * mass)
            carry, _ = jax.lax.scan(micro, carry, length=sample_freq)
            return carry, rec

        _, (poss, vels, forces) = jax.lax.scan(block, (pos, vel, acc),
                                               length=t_save)
        poss, vels, forces = _obs_noise(key, self.noise_var,
                                        poss, vels, forces)
        return poss, vels, forces, mass

    def energy(self, pos, vel, mass):
        ke = 0.5 * (mass * vel ** 2).sum()
        diff = pos[None, :, :] - pos[:, None, :]
        r = jnp.sqrt((diff * diff).sum(-1))
        inv_r = jnp.where(r > 0, 1.0 / jnp.where(r == 0, jnp.inf, r), 0.0)
        pe = self.interaction_strength * jnp.triu(
            -(mass * mass.T) * inv_r, 1).sum()
        return ke + pe


def _clamp_walls(loc, vel, box_size):
    """Elastic wall reflection applied to the initial state (reference
    _clamp, synthetic_sim.py:195-218)."""
    over = loc > box_size
    loc = jnp.where(over, 2 * box_size - loc, loc)
    vel = jnp.where(over, -jnp.abs(vel), vel)
    under = loc < -box_size
    loc = jnp.where(under, -2 * box_size - loc, loc)
    vel = jnp.where(under, jnp.abs(vel), vel)
    return loc, vel


SIM_REGISTRY = {"charged": ChargedSim, "gravity": GravitySim, "springs": SpringSim}


def sample_batch(sim, key, num: int, T: int, sample_freq: int):
    """vmap-ped trajectory sampling: num independent trajectories on device."""
    keys = jax.random.split(key, num)
    fn = jax.vmap(lambda k: sim.sample_trajectory(k, T, sample_freq))
    return fn(keys)
