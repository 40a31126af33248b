"""Large-N simulators driven by the fused Pallas integration kernels.

Same physics and sampling cadence as sim/simulators.py (which lax.scans the
whole trajectory as one XLA program — ideal for vmapped fleets of small
systems). These versions target SINGLE large systems (the 1000-body stretch
config): each sampling block of ``sample_freq`` micro-steps runs as one
Pallas kernel with state resident in VMEM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.pallas.nbody_sim import charged_leapfrog_block, gravity_leapfrog_block
from ..ops.pallas.pairwise import charged_force
from .simulators import ChargedSim, GravitySim


@dataclasses.dataclass(frozen=True)
class LargeNGravitySim(GravitySim):
    """GravitySim with Pallas-fused integration blocks."""

    block_i: int = 128
    interpret: bool = False

    def sample_trajectory(self, key, T: int = 10000, sample_freq: int = 10):
        assert T % sample_freq == 0
        t_save = T // sample_freq
        pos, vel, mass = self._init_state(key)
        acc = self._accel(pos, mass)

        poss, vels, forces = [], [], []
        for _ in range(t_save):
            poss.append(pos)
            vels.append(vel)
            forces.append(acc * mass)
            pos, vel, acc = gravity_leapfrog_block(
                pos, vel, acc, mass, steps=sample_freq, dt=self.dt,
                g=self.interaction_strength, softening=self.softening,
                block_i=self.block_i, interpret=self.interpret)
        return (jnp.stack(poss), jnp.stack(vels), jnp.stack(forces), mass)


@dataclasses.dataclass(frozen=True)
class LargeNChargedSim(ChargedSim):
    """ChargedSim with Pallas-fused integration blocks.

    Recording cadence matches the reference exactly: the state saved at each
    sample point is (position after the drift, velocity BEFORE that step's
    kick) — so each block runs freq-1 fused steps, then the final
    drift/record/kick happens explicitly.
    """

    block_i: int = 128
    interpret: bool = False

    def _force_large(self, loc, charges):
        return charged_force(loc, charges, k=self.interaction_strength,
                             max_f=self._max_f, block_i=self.block_i,
                             interpret=self.interpret)

    def sample_trajectory(self, key, T: int = 10000, sample_freq: int = 10):
        assert T % sample_freq == 0
        t_save = T // sample_freq - 1
        loc, vel, edges, charges = self._init_state(key)
        vel = vel + self.dt * self._force_large(loc, charges)  # pre-loop kick

        locs, vels = [], []
        for _ in range(t_save):
            if sample_freq > 1:
                loc, vel = charged_leapfrog_block(
                    loc, vel, charges, steps=sample_freq - 1, dt=self.dt,
                    k=self.interaction_strength, max_f=self._max_f,
                    block_i=self.block_i, interpret=self.interpret)
            loc = loc + self.dt * vel
            locs.append(loc)
            vels.append(vel)
            vel = vel + self.dt * self._force_large(loc, charges)
        return jnp.stack(locs), jnp.stack(vels), edges, charges
