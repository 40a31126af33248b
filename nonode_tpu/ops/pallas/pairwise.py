"""Pallas blockwise pairwise-interaction kernels for large particle counts.

The standard configs (N <= 20) are served perfectly well by XLA's fused dense
path; these kernels exist for the large-N regime (the 1000-body stretch goal,
BASELINE.md) where a materialized [N, N, 3] separation tensor starts to
pressure HBM and fusion boundaries.

Design (see the TPU kernel playbook):
- positions are carried as three [1, N] lane-major planes (the natural [N, 3]
  layout wastes 125/128 lanes);
- the grid tiles the receiver axis i; each program holds its [BI] receivers
  in VMEM registers and sweeps ALL senders j in lane-parallel [BI, N] tiles,
  accumulating the force reduction on the fly — the [N, N] matrix never
  exists in memory;
- everything is fp32 VPU work (rsqrt-based powers), with the j-reduction as
  a lane reduce.

Two force laws, matching the simulators:
- gravity: a_i = G * sum_j m_j (x_j - x_i) / (r^2 + eps^2)^{3/2}
- charged: F_i = k * sum_j q_i q_j (x_i - x_j) / max(r^3, tiny), clipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gravity_kernel(pos_ref, mass_ref, out_ref, *, g, softening, n):
    """pos_ref: [3, Np] (lane-major planes); mass_ref: [1, Np];
    out_ref: [3, BI] block of accelerations for this program's receivers."""
    i = pl.program_id(0)
    bi = out_ref.shape[1]
    xi = pos_ref[0, pl.ds(i * bi, bi)][:, None]       # [BI, 1]
    yi = pos_ref[1, pl.ds(i * bi, bi)][:, None]
    zi = pos_ref[2, pl.ds(i * bi, bi)][:, None]

    xj = pos_ref[0, :][None, :]                       # [1, Np]
    yj = pos_ref[1, :][None, :]
    zj = pos_ref[2, :][None, :]
    mj = mass_ref[0, :][None, :]

    dx = xj - xi                                      # [BI, Np]
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + softening * softening
    inv_r = jax.lax.rsqrt(r2)
    w = mj * inv_r * inv_r * inv_r                    # m_j / r^3, [BI, Np]
    # padded senders carry mass 0 -> contribute nothing
    out_ref[0, :] = g * (dx * w).sum(axis=1)
    out_ref[1, :] = g * (dy * w).sum(axis=1)
    out_ref[2, :] = g * (dz * w).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("g", "softening", "block_i",
                                             "interpret"))
def gravity_accel(pos, mass, g=1.0, softening=0.1, block_i=256,
                  interpret=False):
    """Blockwise softened-gravity acceleration.

    pos: [N, 3]; mass: [N] or [N, 1] -> acc [N, 3]. Bit-compatible with
    GravitySim._accel up to fp reassociation.
    """
    n = pos.shape[0]
    mass = mass.reshape(-1)
    # bi is rounded to a lane multiple and np_ to a multiple of bi, so the
    # receiver grid tiles EXACTLY — a np_ % bi remainder would silently
    # drop the tail block and return uninitialized force rows
    bi = min(_round_up(block_i, 128), _round_up(n, 128))
    np_ = _round_up(n, bi)
    planes = jnp.zeros((3, np_), pos.dtype).at[:, :n].set(pos.T)
    mpad = jnp.zeros((1, np_), pos.dtype).at[0, :n].set(mass)

    out = pl.pallas_call(
        functools.partial(_gravity_kernel, g=g, softening=softening, n=n),
        out_shape=jax.ShapeDtypeStruct((3, np_), pos.dtype),
        grid=(np_ // bi,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, bi), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, mpad)
    return out[:, :n].T


def _charged_kernel(pos_ref, q_ref, out_ref, *, k, max_f, n):
    """Coulomb forces: F_i = k sum_j q_i q_j (x_i - x_j)/r^3, self-terms and
    padded senders masked, per-component clip at +-max_f."""
    i = pl.program_id(0)
    bi = out_ref.shape[1]
    xi = pos_ref[0, pl.ds(i * bi, bi)][:, None]
    yi = pos_ref[1, pl.ds(i * bi, bi)][:, None]
    zi = pos_ref[2, pl.ds(i * bi, bi)][:, None]
    qi = q_ref[0, pl.ds(i * bi, bi)][:, None]

    xj = pos_ref[0, :][None, :]
    yj = pos_ref[1, :][None, :]
    zj = pos_ref[2, :][None, :]
    qj = q_ref[0, :][None, :]

    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    r2 = dx * dx + dy * dy + dz * dz
    np_ = pos_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bi, np_), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (bi, np_), 0) + i * bi
    valid = (col != row) & (col < n)
    inv_r = jax.lax.rsqrt(jnp.where(valid, r2, 1.0))
    w = jnp.where(valid, k * qi * qj * inv_r * inv_r * inv_r, 0.0)
    fx = jnp.clip((dx * w).sum(axis=1), -max_f, max_f)
    fy = jnp.clip((dy * w).sum(axis=1), -max_f, max_f)
    fz = jnp.clip((dz * w).sum(axis=1), -max_f, max_f)
    out_ref[0, :] = fx
    out_ref[1, :] = fy
    out_ref[2, :] = fz


@functools.partial(jax.jit, static_argnames=("k", "max_f", "block_i",
                                             "interpret"))
def charged_force(pos, charges, k=1.0, max_f=100.0, block_i=256,
                  interpret=False):
    """Blockwise Coulomb forces. pos: [N, 3]; charges: [N] or [N, 1]."""
    n = pos.shape[0]
    q = charges.reshape(-1)
    # bi is rounded to a lane multiple and np_ to a multiple of bi, so the
    # receiver grid tiles EXACTLY — a np_ % bi remainder would silently
    # drop the tail block and return uninitialized force rows
    bi = min(_round_up(block_i, 128), _round_up(n, 128))
    np_ = _round_up(n, bi)
    planes = jnp.zeros((3, np_), pos.dtype).at[:, :n].set(pos.T)
    qpad = jnp.zeros((1, np_), pos.dtype).at[0, :n].set(q)

    out = pl.pallas_call(
        functools.partial(_charged_kernel, k=k, max_f=max_f, n=n),
        out_shape=jax.ShapeDtypeStruct((3, np_), pos.dtype),
        grid=(np_ // bi,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, bi), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, qpad)
    return out[:, :n].T


def pairwise_accel_reference(pos, mass, g=1.0, softening=0.1):
    """Dense XLA reference for the gravity kernel (same math as
    GravitySim._accel)."""
    diff = pos[None, :, :] - pos[:, None, :]
    r2 = (diff * diff).sum(-1) + softening ** 2
    inv_r3 = r2 ** -1.5
    return g * jnp.einsum("ijd,ij,j->id", diff, inv_r3, mass.reshape(-1),
                          precision=jax.lax.Precision.HIGHEST)
