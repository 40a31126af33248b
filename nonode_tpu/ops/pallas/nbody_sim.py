"""Fused multi-step N-body integration kernels.

One ``pallas_call`` advances the system ``steps`` micro-steps with positions,
velocities, and accelerations resident in VMEM the whole time — the
integration loop never round-trips state through HBM, and the pairwise
interaction is computed receiver-block by receiver-block so the [N, N]
matrix never materializes.

This is the large-N engine behind the stretch benchmark (1000-body charged
system, 20k-step energy-drift rollout — BASELINE.md): the host-visible unit
of work becomes one *sampling block* (``sample_freq`` micro-steps), exactly
matching the reference's recording cadence.

Layouts as in pairwise.py: [3, Np] lane-major planes, Np padded to the
receiver block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairwise import _round_up


def _accel_block(pos_planes, mass_row, ib, bi, g, softening):
    """Gravity acceleration for receiver block ib (static): [3, BI]."""
    sl = slice(ib * bi, (ib + 1) * bi)
    xi = pos_planes[0, sl][:, None]
    yi = pos_planes[1, sl][:, None]
    zi = pos_planes[2, sl][:, None]
    xj = pos_planes[0, :][None, :]
    yj = pos_planes[1, :][None, :]
    zj = pos_planes[2, :][None, :]
    mj = mass_row[0, :][None, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + softening * softening
    inv_r = jax.lax.rsqrt(r2)
    w = mj * inv_r * inv_r * inv_r
    return jnp.stack([g * (dx * w).sum(axis=1),
                      g * (dy * w).sum(axis=1),
                      g * (dz * w).sum(axis=1)])


def _charged_force_block(pos_planes, q_row, ib, bi, k, max_f, n):
    """Clipped Coulomb force for receiver block ib: [3, BI]."""
    np_ = pos_planes.shape[1]
    sl = slice(ib * bi, (ib + 1) * bi)
    xi = pos_planes[0, sl][:, None]
    yi = pos_planes[1, sl][:, None]
    zi = pos_planes[2, sl][:, None]
    qi = q_row[0, sl][:, None]
    xj = pos_planes[0, :][None, :]
    yj = pos_planes[1, :][None, :]
    zj = pos_planes[2, :][None, :]
    qj = q_row[0, :][None, :]
    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    r2 = dx * dx + dy * dy + dz * dz
    col = jax.lax.broadcasted_iota(jnp.int32, (bi, np_), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (bi, np_), 0) + ib * bi
    valid = (col != row) & (col < n)
    inv_r = jax.lax.rsqrt(jnp.where(valid, r2, 1.0))
    w = jnp.where(valid, k * qi * qj * inv_r * inv_r * inv_r, 0.0)
    return jnp.stack([jnp.clip((dx * w).sum(axis=1), -max_f, max_f),
                      jnp.clip((dy * w).sum(axis=1), -max_f, max_f),
                      jnp.clip((dz * w).sum(axis=1), -max_f, max_f)])


def _gravity_block_kernel(pos_ref, vel_ref, acc_ref, mass_ref,
                          pos_out, vel_out, acc_out,
                          *, steps, dt, g, softening, bi):
    """Advance `steps` kick-drift-kick micro-steps entirely in VMEM."""
    np_ = pos_ref.shape[1]
    nb = np_ // bi

    def accel_all(pos):
        blocks = [
            _accel_block(pos, mass_ref, ib, bi, g, softening)
            for ib in range(nb)]
        return jnp.concatenate(blocks, axis=1)        # [3, Np]

    def body(_, carry):
        pos, vel, acc = carry
        vel = vel + acc * (dt / 2.0)
        pos = pos + vel * dt
        acc = accel_all(pos)
        vel = vel + acc * (dt / 2.0)
        return pos, vel, acc

    pos, vel, acc = jax.lax.fori_loop(
        0, steps, body, (pos_ref[:], vel_ref[:], acc_ref[:]))
    pos_out[:] = pos
    vel_out[:] = vel
    acc_out[:] = acc


@functools.partial(jax.jit, static_argnames=("steps", "dt", "g", "softening",
                                             "block_i", "interpret"))
def gravity_leapfrog_block(pos, vel, acc, mass, steps: int, dt=0.001, g=1.0,
                           softening=0.1, block_i=128, interpret=False):
    """Advance (pos, vel, acc) by `steps` KDK micro-steps in one kernel.

    pos/vel/acc: [N, 3]; mass: [N] or [N, 1]. Returns updated (pos, vel, acc).
    Matches GravitySim's integration loop (synthetic_sim.py:383-398).
    """
    n = pos.shape[0]
    # bi is rounded to a lane multiple and np_ to a multiple of bi, so the
    # receiver grid tiles EXACTLY — a np_ % bi remainder would silently
    # drop the tail block and return uninitialized force rows
    bi = min(_round_up(block_i, 128), _round_up(n, 128))
    np_ = _round_up(n, bi)
    pad = lambda a: jnp.zeros((3, np_), a.dtype).at[:, :n].set(a.T)
    mpad = jnp.zeros((1, np_), pos.dtype).at[0, :n].set(mass.reshape(-1))

    outs = pl.pallas_call(
        functools.partial(_gravity_block_kernel, steps=steps, dt=dt, g=g,
                          softening=softening, bi=bi),
        out_shape=[jax.ShapeDtypeStruct((3, np_), pos.dtype)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        interpret=interpret,
    )(pad(pos), pad(vel), pad(acc), mpad)
    return tuple(o[:, :n].T for o in outs)


def _charged_block_kernel(pos_ref, vel_ref, q_ref,
                          pos_out, vel_out,
                          *, steps, dt, k, max_f, bi, n):
    """Advance `steps` micro-steps of the charged integrator (drift, force,
    kick — synthetic_sim.py:266-292) entirely in VMEM."""
    np_ = pos_ref.shape[1]
    nb = np_ // bi

    def force_all(pos):
        blocks = [
            _charged_force_block(pos, q_ref, ib, bi, k, max_f, n)
            for ib in range(nb)]
        return jnp.concatenate(blocks, axis=1)

    def body(_, carry):
        pos, vel = carry
        pos = pos + dt * vel
        vel = vel + dt * force_all(pos)
        return pos, vel

    pos, vel = jax.lax.fori_loop(0, steps, body, (pos_ref[:], vel_ref[:]))
    pos_out[:] = pos
    vel_out[:] = vel


@functools.partial(jax.jit, static_argnames=("steps", "dt", "k", "max_f",
                                             "block_i", "interpret"))
def charged_leapfrog_block(pos, vel, charges, steps: int, dt=0.001, k=1.0,
                           max_f=100.0, block_i=128, interpret=False):
    """Advance (pos, vel) by `steps` drift-force-kick micro-steps in one
    kernel. pos/vel: [N, 3]; charges: [N] or [N, 1]."""
    n = pos.shape[0]
    # bi is rounded to a lane multiple and np_ to a multiple of bi, so the
    # receiver grid tiles EXACTLY — a np_ % bi remainder would silently
    # drop the tail block and return uninitialized force rows
    bi = min(_round_up(block_i, 128), _round_up(n, 128))
    np_ = _round_up(n, bi)
    pad = lambda a: jnp.zeros((3, np_), a.dtype).at[:, :n].set(a.T)
    qpad = jnp.zeros((1, np_), pos.dtype).at[0, :n].set(charges.reshape(-1))

    outs = pl.pallas_call(
        functools.partial(_charged_block_kernel, steps=steps, dt=dt, k=k,
                          max_f=max_f, bi=bi, n=n),
        out_shape=[jax.ShapeDtypeStruct((3, np_), pos.dtype)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )(pad(pos), pad(vel), qpad)
    return tuple(o[:, :n].T for o in outs)
