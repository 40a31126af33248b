"""Seed-fleet training: vmap over model replicas.

The reference runs sweep seeds as independent wandb agent processes
(_schedule.yaml + EGNO_sweep.py) — one full training per process. On TPU the
models are tiny (hidden 64), so an entire seed group trains SIMULTANEOUSLY as
one vmapped program: params/opt-states carry a leading seed axis [K, ...],
each replica consumes its own epoch permutation, and the whole K-seed epoch
is still one device dispatch. The measured win is amortizing the per-epoch
host dispatch/sync across K seeds (~4.6x wall-clock for EGNO on the
tunneled chip); the pure device compute under vmap is ~linear in K, so
workloads whose sequential epochs are already compute-cheap relative to
host overhead (SEGNO) see little benefit — see RESULTS.md fleets section.

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


class FleetEarlyStopping:
    """Vectorized EarlyStopping over K seeds — decision-equivalent to K
    sequential ``train.checkpoint.EarlyStopping`` instances (same strict
    improvement rule and patience counting; pinned by
    tests/test_parallel.py)."""

    def __init__(self, k: int, patience: int = 15, delta: float = 0.0):
        self.patience = patience
        self.delta = delta
        self.best_val = np.full(k, np.inf)
        self.best_epoch = np.zeros(k, int)
        self.counter = np.zeros(k, int)
        self.stopped = np.zeros(k, bool)

    def __call__(self, val: np.ndarray, epoch: int) -> np.ndarray:
        """val: [K] validation losses (entries for stopped seeds ignored).
        Returns the improved mask [K]."""
        # NB: ties count as improvement (reference EarlyStopping,
        # EGNO/utils.py:263: counter only when score < best + delta).
        # Negated-comparison form so NaN follows the reference too: a NaN
        # val fails `score < best + delta` and lands in the improvement
        # branch (best := NaN, checkpoint saved, counter reset) — and every
        # later val compares False against the NaN best, i.e. also
        # "improves". `val <= best - delta` would instead count NaNs toward
        # patience and stop, diverging from sequential runs exactly in the
        # blowup cases.
        improved = ~(val > self.best_val - self.delta) & ~self.stopped
        self.best_val = np.where(improved, val, self.best_val)
        self.best_epoch = np.where(improved, epoch, self.best_epoch)
        self.counter = np.where(improved, 0,
                                np.where(self.stopped, self.counter,
                                         self.counter + 1))
        self.stopped |= self.counter >= self.patience
        return improved

    @property
    def all_stopped(self) -> bool:
        return bool(self.stopped.all())


class SeedFleet:
    """Train K independently-seeded replicas of an EGNO/SEGNO experiment at
    once (EGNO via train_epoch/eval_epoch; SEGNO via the _segno variants)."""

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

    @functools.partial(jax.jit, static_argnums=0)
    def train_epoch_idx(self, params, opt_state, ds_arrays, idx_arrays, perms):
        """EGNO epoch with PER-SEED index arrays (leading K axis on every
        idx entry): multi-input / varDT groups, where each seed samples its
        own input-offset arrays per epoch from its own rng stream — the
        fleet analogue of the sequential driver's per-epoch
        ``epoch_index_arrays(ds, rng)`` call (main.py:232-237)."""

        def one(params, opt_state, idx, perm):
            return self.exp.train_epoch(params, opt_state, ds_arrays, idx,
                                        perm)

        return jax.vmap(one, in_axes=(0, 0, 0, 0))(params, opt_state,
                                                   idx_arrays, perms)

    @functools.partial(jax.jit, static_argnums=0)
    def eval_epoch_idx(self, params, ds_arrays, idx_arrays, perm):
        """Eval with per-seed index arrays; eval batches (perm) are shared
        (the sequential driver's val perm is the unshuffled arange,
        loop.py make_perm(shuffle=False))."""
        return jax.vmap(
            lambda p, idx: self.exp.eval_epoch(p, ds_arrays, idx, perm),
            in_axes=(0, 0))(params, idx_arrays)

    @functools.partial(jax.jit, static_argnums=(0, 5, 6))
    def train_epoch_segno(self, params, opt_state, ds_arrays, perms, frames,
                          in_steps):
        """SEGNO fleet epoch: params/opt_state [K, ...]; perms [K, nb, B];
        frames/in_steps static (single-input or constant multi-input)."""

        def one(p, o, perm):
            return self.exp.train_epoch(p, o, ds_arrays, perm, frames,
                                        in_steps)

        return jax.vmap(one, in_axes=(0, 0, 0))(params, opt_state, perms)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def eval_epoch_segno(self, params, ds_arrays, perm, frames, in_steps):
        return jax.vmap(
            lambda p: self.exp.eval_epoch(p, ds_arrays, perm, frames,
                                          in_steps))(params)

    def split(self, params):
        """[K, ...] stacked params -> list of per-seed param pytrees."""
        return [jax.tree.map(lambda a: a[i], params) for i in range(self.k)]

    def take(self, tree, keep):
        """Gather the rows of a [K, ...] pytree (fleet compaction: stopped
        seeds are removed so they stop consuming compute)."""
        keep = jnp.asarray(keep)
        return jax.tree.map(lambda a: a[keep], tree)
