"""Device-mesh parallelism: data-parallel batches + space-parallel particles.

The reference's only distribution surface is vestigial torch DDP samplers
(SEGNO/utils.py:10-25,46-93 — never initialized by any live entry point).
Here distribution is first-class and TPU-native:

- a named ``Mesh`` over ("data", "space");
- the batch axis sharded over "data" (data parallel) — XLA inserts the
  gradient psum over ICI from sharding propagation, no hand-written
  collectives;
- the particle axis N sharded over "space" for large-N configs: the dense
  [B, N, N, .] pairwise tensors shard over the receiver axis i, and XLA
  all-gathers the sender axis j as needed (the N-body analogue of
  sequence-parallel attention);
- deterministic eval sharding comes free: batches are index ranges, not
  sampler state (replaces DistributedEvalSampler semantics).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, space: int = 1,
              devices=None) -> Mesh:
    """Mesh over ("data", "space"). ``space`` divides the particle axis;
    the rest of the devices do data parallelism."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % space == 0, f"{n} devices not divisible by space={space}"
    grid = np.asarray(devices).reshape(n // space, space)
    return Mesh(grid, ("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, shard_particles: bool = False) -> NamedSharding:
    """Leading batch dim over 'data'; optionally particle dim over 'space'."""
    if shard_particles:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def _egno_batch_shardings(mesh: Mesh, shard_particles: bool):
    """Shardings for an EGNOExperiment batch tuple
    (loc_in [B,L,N,3], vel_in, charges [B,N,1], w [B,N,N,1],
     loc_out [B,T,N,3], t_in [B,L], t_out [B,T])."""
    sp = "space" if shard_particles else None
    return (
        NamedSharding(mesh, P("data", None, sp)),      # loc_in
        NamedSharding(mesh, P("data", None, sp)),      # vel_in
        NamedSharding(mesh, P("data", sp)),            # charges
        NamedSharding(mesh, P("data", sp)),            # w (receiver axis i)
        NamedSharding(mesh, P("data", None, sp)),      # loc_out
        NamedSharding(mesh, P("data")),                # t_in
        NamedSharding(mesh, P("data")),                # t_out
    )


def make_sharded_train_step(exp, mesh: Mesh, shard_particles: bool = False):
    """One optimization step of an EGNOExperiment, sharded over the mesh.

    Params/opt state are replicated; the batch is sharded over 'data' (and
    the particle axis over 'space' when requested). Returns a jitted
    step(params, opt_state, batch) -> (params, opt_state, loss).
    """
    repl = replicated(mesh)
    batch_sh = _egno_batch_shardings(mesh, shard_particles)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, batch_sh),
        out_shardings=(repl, repl, repl))
    def step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(exp._loss, has_aux=True)(
            params, batch)
        updates, opt_state = exp.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def shard_batch(batch, shardings):
    """Place a host batch onto the mesh with the given shardings."""
    return tuple(jax.device_put(b, s) for b, s in zip(batch, shardings))


def apply_mesh(exp, mesh: Mesh, shard_particles: bool = False):
    """Attach a mesh to an EGNO/SEGNO experiment: its jitted epoch programs
    then sharding-constrain every scanned batch over ('data'[, 'space'])
    and XLA inserts the gradient psum. Call before the first epoch."""
    exp.mesh = mesh
    exp.shard_particles = shard_particles
    return exp


def replicate_dataset(ds, mesh: Mesh):
    """Replicate a device-resident NBodyDataset's arrays across the mesh
    (they are small; each device gathers its own batch shard locally —
    replaces DistributedSampler-style per-rank loaders,
    SEGNO/utils.py:10-25)."""
    repl = replicated(mesh)
    for name in ("loc", "vel", "charges", "edge_weights"):
        setattr(ds, name, jax.device_put(getattr(ds, name), repl))
    return ds
