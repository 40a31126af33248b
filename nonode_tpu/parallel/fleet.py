"""Seed-fleet training: vmap over model replicas.

The reference runs sweep seeds as independent wandb agent processes
(_schedule.yaml + EGNO_sweep.py) — one full training per process. On TPU the
models are tiny (hidden 64), so an entire seed group trains SIMULTANEOUSLY as
one vmapped program: params/opt-states carry a leading seed axis [K, ...],
each replica consumes its own epoch permutation, and the whole K-seed epoch
is still one device dispatch. This is the main lever behind the >=50x sweep
throughput target (BASELINE.md).

Also here: deterministic no-padding eval sharding — the semantics of the
reference's DistributedEvalSampler (SEGNO/utils.py:46-93: strided
rank::world split of the index range, no duplicate padding) for multi-host
fleets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..train.loop import EGNOExperiment, make_perm


def eval_shard_indices(n: int, world_size: int, rank: int,
                       shuffle: bool = False, seed: int = 0,
                       epoch: int = 0) -> np.ndarray:
    """Strided, padding-free eval split (DistributedEvalSampler semantics)."""
    if shuffle:
        rng = np.random.RandomState(seed + epoch)
        indices = rng.permutation(n)
    else:
        indices = np.arange(n)
    return indices[rank:n:world_size]


class SeedFleet:
    """Train K independently-seeded replicas of an EGNOExperiment at once."""

    def __init__(self, exp: EGNOExperiment, seeds):
        self.exp = exp
        self.seeds = list(seeds)

    @property
    def k(self) -> int:
        return len(self.seeds)

    def init(self):
        keys = jnp.stack([jax.random.PRNGKey(s) for s in self.seeds])
        params = jax.vmap(self.exp.model.init)(keys)
        opt_state = jax.vmap(self.exp.optimizer.init)(params)
        return params, opt_state

    def make_perms(self, rngs, n, batch_size):
        """Per-seed epoch permutations: [K, num_batches, B]."""
        return np.stack([make_perm(r, n, batch_size) for r in rngs])

    @functools.partial(jax.jit, static_argnums=0)
    def train_epoch(self, params, opt_state, ds_arrays, idx_arrays, perms):
        """params/opt_state: [K, ...]; perms: [K, nb, B]. One dispatch."""

        def one(params, opt_state, perm):
            return self.exp.train_epoch(params, opt_state, ds_arrays,
                                        idx_arrays, perm)

        return jax.vmap(one, in_axes=(0, 0, 0))(params, opt_state, perms)

    @functools.partial(jax.jit, static_argnums=0)
    def eval_epoch(self, params, ds_arrays, idx_arrays, perm):
        """Shared eval batches for every replica."""
        return jax.vmap(
            lambda p: self.exp.eval_epoch(p, ds_arrays, idx_arrays, perm))(params)

    def split(self, params):
        """[K, ...] stacked params -> list of per-seed param pytrees."""
        return [jax.tree.map(lambda a: a[i], params) for i in range(self.k)]
