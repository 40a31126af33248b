"""Metrics library — on-device jnp versions of the reference's NumPy metrics
(root utils.py). The reference computes energies on the host inside the
rollout loop (utils.py:197-219, a device->host sync per step); here everything
stays on the accelerator and vmaps over the batch.

Definitions mirrored:
- tot_energy_charged_batch (utils.py:126-144): K = 0.5 sum |v|^2,
  U = 0.5 * k * sum_{i != j} q_i q_j / r_ij (both orders counted).
- tot_energy_gravity_batch (utils.py:175-195): KE = 0.5 sum m |v|^2,
  PE = G * sum_{i<j} -(m_i m_j) / r_ij.
- conserved_energy_fun (utils.py:197-219): dispatch on dataset name; the
  "edges" argument is the per-node charge/mass column [B*N, 1] exactly as the
  train loops pass it.
- compute_energy_drift (utils.py:221-243): |Et - E0| / (E0 + 1e-10).
- pearson_correlation_batch (utils.py:261-321): per-sample correlation over
  the flattened (N*3) state, evaluated on the first 40% of the horizon;
  returns (correlation [B, cut], mean #steps until corr < 0.5, first global
  failure index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tot_energy_spring_batch(loc, vel, edges, interaction_strength=0.1):
    """Spring system energy (utils.py:88-99): K = 0.5 sum |v|^2,
    U = 0.5 * k * sum_{i != j} w_ij * r_ij^2 / 2.
    loc, vel: [..., N, 3]; edges: [..., N, N] spring constants."""
    k = 0.5 * (vel ** 2).sum(axis=(-1, -2))
    diff = loc[..., :, None, :] - loc[..., None, :, :]
    r2 = (diff ** 2).sum(-1)
    n = loc.shape[-2]
    mask = 1.0 - jnp.eye(n)
    u = (0.5 * interaction_strength * edges * r2 * mask / 2.0).sum(axis=(-1, -2))
    return k + u


def cumulative_random_tensor_indices(rng, size, start, end):
    """Random ints in [start, end) and their cumulative sum
    (root utils.py:33-39). rng: np.random.RandomState."""
    import numpy as _np
    arr = rng.randint(start, end, size=size)
    return _np.cumsum(arr), arr


def cumulative_random_tensor_indices_capped(rng, n, start, end, maximum=100):
    """Random int tensor rescaled so its cumulative sum hits `maximum`
    (root utils.py:42-84). Returns (cumulative, adjusted array)."""
    import numpy as _np
    arr = rng.randint(start, end, size=n)
    while arr.sum() == 0:
        arr = rng.randint(start, end, size=n)
    scaled = _np.round(arr.astype(float) / arr.sum() * maximum).astype(int)
    diff = maximum - scaled.sum()
    if diff != 0:
        for i in rng.permutation(n):
            if start <= scaled[i] + diff < end:
                scaled[i] += diff
                break
    return _np.cumsum(scaled), scaled


def tot_energy_charged_batch(loc, vel, edges, interaction_strength=1.0):
    """loc, vel: [..., N, 3]; edges: [..., N, N] interaction products."""
    k = 0.5 * (vel ** 2).sum(axis=(-1, -2))
    diff = loc[..., :, None, :] - loc[..., None, :, :]
    dist = jnp.sqrt((diff ** 2).sum(-1))
    dist = jnp.where(dist == 0, jnp.inf, dist)
    u = 0.5 * interaction_strength * (edges / dist).sum(axis=(-1, -2))
    return k + u


def tot_energy_gravity_batch(loc, vel, mass, G=1.0):
    """loc, vel: [..., N, 3]; mass: [..., N, 1]."""
    ke = 0.5 * (mass * vel ** 2).sum(axis=(-1, -2))
    diff = loc[..., :, None, :] - loc[..., None, :, :]
    r = jnp.sqrt((diff ** 2).sum(-1))
    inv_r = jnp.where(r > 0, 1.0 / jnp.where(r == 0, jnp.inf, r), 0.0)
    mm = mass[..., :, None, 0] * mass[..., None, :, 0]
    n = loc.shape[-2]
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), 1)
    pe = G * jnp.where(upper, -mm * inv_r, 0.0).sum(axis=(-1, -2))
    return ke + pe


def conserved_energy(dataset: str, loc, vel, charges):
    """Batched energy oracle.

    loc, vel: [B, N, 3]; charges: [B, N, 1] (charges for 'charged', masses for
    'gravity' — the reference's gravity files store masses in the charges
    slot, generate_dataset.py:73,89).
    """
    if dataset == "gravity":
        return tot_energy_gravity_batch(loc, vel, charges)
    if dataset == "charged":
        w = jnp.einsum("...ik,...jk->...ij", charges, charges,
                       precision=jax.lax.Precision.HIGHEST)
        return tot_energy_charged_batch(loc, vel, w)
    raise ValueError(f"Unknown dataset: {dataset}")


def energy_drift(energies):
    """energies: [T, ...] -> |Et - E0| / (E0 + 1e-10), shape [T, ...]."""
    e0 = energies[0]
    return jnp.abs((energies - e0) / (e0 + 1e-10))


def pearson_correlation_batch(x, y, n_nodes: int):
    """x, y: [T, B*N, 3] predictions / ground truth.

    Returns (correlation [B, cut], avg_num_steps scalar, first_failure_index
    scalar) with cut = int(0.4 * T), matching utils.py:261-321.
    """
    t = x.shape[0]
    cut = max(int(0.4 * t), 1)  # reference int(0.4*T) breaks for T < 3
    b = x.shape[1] // n_nodes
    xs = x.reshape(t, b, -1)[:cut].transpose(1, 0, 2)   # [B, cut, N*3]
    ys = y.reshape(t, b, -1)[:cut].transpose(1, 0, 2)

    xm = xs - xs.mean(axis=2, keepdims=True)
    ym = ys - ys.mean(axis=2, keepdims=True)
    cov = (xm * ym).sum(axis=2)
    std_x = jnp.sqrt((xm ** 2).sum(axis=2))
    std_y = jnp.sqrt((ym ** 2).sum(axis=2))
    corr = cov / (std_x * std_y)                         # [B, cut]

    below = corr < 0.5
    any_below = below.any(axis=1)
    first_below = jnp.argmax(below, axis=1)              # 0 if none; fixed below
    num_steps = jnp.where(any_below, first_below, cut)
    avg_num_steps = num_steps.astype(jnp.float32).mean()

    col_ok = (corr >= 0.5).all(axis=0)                   # [cut]
    first_failure = jnp.where(col_ok.all(), corr.shape[1],
                              jnp.argmax(~col_ok))
    return corr, avg_num_steps, first_failure
