"""Training/eval/rollout loops for EGNO and SEGNO — TPU-first.

Behavioral parity targets:
- EGNO run_epoch / prepare_inputs / rollout_fn
  (EGNO/main_simulation_simple_no.py:190-384)
- SEGNO run_epoch / rollout_fn (SEGNO/train_nbody.py:57-236)

TPU-first design differences (not behavior):
- The dataset lives on device; a batch is a device-side gather by sample
  index. There is no DataLoader, collate, or per-batch ``.to(device)``.
- A whole epoch runs as ONE jitted ``lax.scan`` over batches — one dispatch
  per epoch instead of one per batch.
- Rollout keeps the energy oracle on device (the reference syncs to host
  NumPy every decoded step, utils.py:197-219).
- Optimizer: optax.chain(add_decayed_weights, adam) == torch.optim.Adam with
  weight_decay (L2-into-gradient, not AdamW).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.nbody import NBodyDataset
from ..models.egno import EGNO
from ..models.segno import SEGNO
from .metrics import conserved_energy, pearson_correlation_batch


def adam_l2(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay): wd*p added to the gradient before
    the moment updates."""
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.adam(lr))


def prepare_inputs(loc, vel, edge_w, charges=None):
    """Feature construction (main_simulation_simple_no.py:311-339).

    loc, vel: [..., N, 3]; edge_w: [..., N, N, 1]; charges: [B, N, 1] or None.
    Returns (nodes [..., N, F], edge_attr [..., N, N, 2], loc_mean [..., N, 3]).
    """
    speed = jnp.sqrt((vel ** 2).sum(-1, keepdims=True))
    if charges is not None:
        q = jnp.broadcast_to(charges, speed.shape)
        nodes = jnp.concatenate([speed, q], axis=-1)
    else:
        nodes = speed
    diff = loc[..., :, None, :] - loc[..., None, :, :]
    dist = (diff ** 2).sum(-1, keepdims=True)
    edge_attr = jnp.concatenate([jnp.broadcast_to(edge_w, dist.shape), dist],
                                axis=-1)
    loc_mean = loc.mean(axis=-2, keepdims=True)
    loc_mean = jnp.broadcast_to(loc_mean, loc.shape)
    return nodes, edge_attr, loc_mean


def _gather_window(arr, idx, frames):
    """arr: [S, F, ...]; idx: [B]; frames: [B, K] -> [B, K, ...]."""
    return arr[idx[:, None], frames]


def _finite_metrics(artifact, bound_mult=10.0):
    """Companion metrics for diverging autoregressive rollouts.

    The reference-semantic test_loss averages squared errors over the 40%
    horizon even for samples whose feedback loop has blown up to inf/NaN
    (the reference's own horizon cut exists "to avoid NaN values",
    utils.py:276). These extras keep reports usable: the loss over samples
    that stayed finite, and how many did.
    """
    preds = artifact["preds"]
    targets = artifact["targets"][:, : preds.shape[1]]
    # "converged" = stayed within bound_mult x the ground-truth coordinate
    # range the whole horizon (near-overflow float32 garbage is finite but
    # meaningless). 10x is a heuristic; scripts/bound_sensitivity.py sweeps
    # 3x/10x/30x over the committed grids to show published finite
    # fractions are not knife-edge on it.
    bound = bound_mult * max(float(np.abs(targets).max()), 1.0)
    with np.errstate(invalid="ignore"):
        ok = (np.isfinite(preds) & (np.abs(preds) <= bound)).all(axis=(1, 2, 3))
    out = {"finite_fraction": float(ok.mean())}
    if ok.any():
        d = preds[ok] - targets[ok]
        out["test_loss_finite"] = float((d ** 2).mean())
    else:
        out["test_loss_finite"] = float("nan")
    return out


@dataclasses.dataclass(eq=False)
class EGNOExperiment:
    """EGNO training/eval/rollout against a device-resident dataset."""

    model: EGNO
    lr: float = 1e-4
    weight_decay: float = 1e-8
    remat: bool = False  # rematerialize the forward in the loss: trades
    #                      ~30% more FLOPs for O(layers) less HBM — needed
    #                      for large-N or seed-fleet configs (a 3-seed
    #                      charged-20 fleet otherwise needs 22.7G > 15.75G)
    compute_dtype: Any = None  # e.g. jnp.bfloat16: cast params+batch for the
    #                            fwd/bwd (fp32 master weights + Adam state,
    #                            fp32 loss). Off by default — fp32 is the
    #                            physics-parity mode; bf16 is the speed mode.
    mesh: Any = None  # jax.sharding.Mesh("data","space"): each scanned batch
    #                   is sharding-constrained over it; XLA propagates the
    #                   shardings through fwd/bwd and inserts the gradient
    #                   psum (params stay replicated). Set via
    #                   parallel.mesh.apply_mesh / the driver --dp/--space.
    shard_particles: bool = False  # also shard the particle axis over 'space'

    def __post_init__(self):
        self.optimizer = adam_l2(self.lr, self.weight_decay)

    def _constrain(self, batch):
        """Pin the batch tuple's sharding over the mesh (no-op without one).
        Specs match _egno_batch_shardings (parallel/mesh.py)."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        sp = "space" if self.shard_particles else None
        specs = (P("data", None, sp), P("data", None, sp), P("data", sp),
                 P("data", sp), P("data", None, sp), P("data"), P("data"))
        return tuple(
            jax.lax.with_sharding_constraint(b, NamedSharding(self.mesh, s))
            for b, s in zip(batch, specs))

    def init(self, key):
        params = self.model.init(key)
        return params, self.optimizer.init(params)

    # ---------- batch construction ----------

    def epoch_index_arrays(self, ds: NBodyDataset, rng: np.random.RandomState):
        """Host-side per-epoch index arrays (static shapes).

        Returns dict of numpy arrays: frames_in [S, L], t_in [S, L],
        out_frames [S, T'], t_out [S, T'].
        """
        s = len(ds)
        if ds.num_inputs > 1:
            frames_in, t_in = ds.sample_input_offsets(rng)
        else:
            frames_in = np.full((s, 1), ds.start, np.int32)
            t_in = np.zeros((s, 1), np.float32)
        base_out = ds.out_indices()
        shift = frames_in[:, -1:] - ds.start
        out_frames = base_out[None, :] + shift
        # static-shape truncation: drop tail columns any sample would index
        # past the trajectory end (reference truncates per sample,
        # dataset_simple.py:156-158; with varDT this caps at the worst case)
        valid = (out_frames < ds.n_frames).all(axis=0)
        out_frames = out_frames[:, valid]
        t_out = (out_frames - frames_in[:, -1:]).astype(np.float32)
        return {"frames_in": frames_in.astype(np.int32), "t_in": t_in,
                "out_frames": out_frames.astype(np.int32), "t_out": t_out}

    def _batch(self, ds_arrays, idx_arrays, idx):
        loc_all, vel_all, charges_all, w_all = ds_arrays
        frames_in = idx_arrays["frames_in"][idx]      # [B, L]
        loc_in = _gather_window(loc_all, idx, frames_in)   # [B, L, N, 3]
        vel_in = _gather_window(vel_all, idx, frames_in)
        charges = charges_all[idx]
        w = w_all[idx]
        loc_out = _gather_window(loc_all, idx, idx_arrays["out_frames"][idx])
        t_in = idx_arrays["t_in"][idx]
        t_out = idx_arrays["t_out"][idx]
        # BATCH-GLOBAL time normalization: the reference subtracts the
        # batch-wide in_indices.max() from both index tensors
        # (main_simulation_simple_no.py:208-209), not a per-sample anchor.
        # The stored t_in/t_out are per-sample (relative to each sample's
        # last input frame); the correction term last_i - max_batch(last)
        # restores the reference values. It is identically zero whenever
        # every sample's last input frame coincides (single-input, and all
        # charged windows, where frames never shift) — only gravity
        # multi-input varDT windows (per-sample push-forward shifts,
        # dataset_simple.py:147-150) are affected.
        corr = (frames_in[:, -1:] - frames_in[:, -1:].max()) \
            .astype(jnp.float32)                      # [B, 1] <= 0
        t_in = t_in + corr
        t_out = t_out + corr
        return self._constrain(
            (loc_in, vel_in, charges, w, loc_out, t_in, t_out))

    def _forward(self, params, loc_in, vel_in, charges, w, t_in, t_out):
        multi = self.model.num_inputs > 1
        if multi:
            loc = jnp.swapaxes(loc_in, 0, 1)          # [L, B, N, 3]
            vel = jnp.swapaxes(vel_in, 0, 1)
            nodes, edge_attr, loc_mean = prepare_inputs(
                loc, vel, w[None], charges[None])
        else:
            loc = loc_in[:, 0]
            vel = vel_in[:, 0]
            nodes, edge_attr, loc_mean = prepare_inputs(loc, vel, w, charges)
        return self.model(params, loc, vel, nodes, edge_attr, loc_mean,
                          timesteps_out=t_out, timesteps_in=t_in if multi else None)

    def _loss(self, params, batch):
        loc_in, vel_in, charges, w, loc_out, t_in, t_out = batch
        t_model = self.model.num_timesteps
        if self.compute_dtype is not None:
            cast = lambda a: a.astype(self.compute_dtype)
            params = jax.tree.map(cast, params)
            loc_in, vel_in, charges, w = map(cast, (loc_in, vel_in, charges, w))
        fwd = jax.checkpoint(self._forward, static_argnums=()) if self.remat \
            else self._forward
        x, _, _ = fwd(params, loc_in, vel_in, charges, w, t_in,
                      t_out[:, :t_model])
        x = x.astype(jnp.float32)
        pred = jnp.swapaxes(x, 0, 1)                  # [B, T, N, 3]
        target = loc_out[:, :t_model]
        losses = ((pred - target) ** 2).mean(axis=(0, 2, 3))  # [T]
        # backprop target is the mean over timesteps; the reference reports
        # the LAST-timestep loss as the epoch loss (main_simulation_simple_no.py:287)
        return losses.mean(), losses

    # ---------- jitted epoch programs ----------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def train_epoch(self, params, opt_state, ds_arrays, idx_arrays, perm):
        """perm: [num_batches, B] sample indices. Returns new state + the
        per-batch (mean_loss, last_step_loss). params/opt_state buffers are
        donated (updated in place on device)."""

        def body(carry, idx):
            params, opt_state = carry
            batch = self._batch(ds_arrays, idx_arrays, idx)
            (loss, losses), grads = jax.value_and_grad(
                self._loss, has_aux=True)(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, losses[-1])

        (params, opt_state), (losses, last_losses) = jax.lax.scan(
            body, (params, opt_state), perm)
        return params, opt_state, losses, last_losses

    @functools.partial(jax.jit, static_argnums=0)
    def eval_epoch(self, params, ds_arrays, idx_arrays, perm):
        def body(_, idx):
            batch = self._batch(ds_arrays, idx_arrays, idx)
            loss, losses = self._loss(params, batch)
            return None, (loss, losses[-1])

        _, (losses, last_losses) = jax.lax.scan(body, None, perm)
        return losses, last_losses

    # ---------- rollout ----------

    def rollout(self, params, batch, traj_len: int, dataset_kind: str):
        """Autoregressive windowed rollout (main_simulation_simple_no.py:342-384).

        Feeds the decoded frames at the input-offset positions back as the
        next window's inputs; evaluates the energy oracle per decoded frame
        on device. Returns (locs_pred [traj_len*T, B, N, 3],
        energies [traj_len*T, B, 1]).
        """
        loc_in, vel_in, charges, w, _, t_in, t_out_all = batch
        t_model = self.model.num_timesteps
        # per-window output timesteps, shifted back by i*T as the reference
        # does (main_simulation_simple_no.py:358-359)
        t_wins = jnp.stack([
            t_out_all[:, i * t_model:(i + 1) * t_model] - i * t_model
            for i in range(traj_len)])                # [traj_len, B, T]
        # feedback frames at timesteps_in - 1 (negative => from the end),
        # per sample (main_simulation_simple_no.py:367-368)
        fb = (t_in.astype(jnp.int32) - 1) % t_model   # [B, L]
        take = jax.vmap(lambda xs, f: xs[f], in_axes=(1, 0))  # over B

        def body(carry, t_out):
            loc, vel = carry
            x, v, _ = self._forward(params, loc, vel, charges, w, t_in, t_out)
            e = conserved_energy(dataset_kind, x, v, charges)  # [T, B]
            return (take(x, fb), take(v, fb)), (x, e)

        _, (xs, es) = jax.lax.scan(body, (loc_in, vel_in), t_wins)
        locs_pred = xs.reshape(traj_len * t_model, *xs.shape[2:])
        energies = es.reshape(traj_len * t_model, -1)[..., None]
        return locs_pred, energies

    def test_rollout(self, params, ds: NBodyDataset, batch_size: int,
                     rng: np.random.RandomState):
        """Full test evaluation. Returns (test_loss, avg_num_steps, artifact).

        artifact = {targets, preds, energy_conservation, test_loss} with the
        reference shapes ([B_total, T, N, 3] / [B_total, Tcut, ., .]).
        """
        t_model = self.model.num_timesteps
        idx_arrays = self.epoch_index_arrays(ds, rng)
        avail = idx_arrays["out_frames"].shape[1]
        traj_len = min(ds.traj_len, avail // t_model)
        cut = int(0.4 * ds.traj_len * t_model)

        ds_arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        idx_dev = {k: jnp.asarray(v) for k, v in idx_arrays.items()}

        roll_fn = jax.jit(lambda p, b: self.rollout(p, b, traj_len, ds.dataset))

        n = len(ds)
        tot_loss = tot_steps = count = 0.0
        targets_l, preds_l, energies_l = [], [], []
        for s0 in range(0, n - batch_size + 1, batch_size):
            idx = jnp.arange(s0, s0 + batch_size)
            batch = self._batch(ds_arrays, idx_dev, idx)
            locs_pred, energies = roll_fn(params, batch)
            loc_true = batch[4]                       # [B, T', N, 3]
            tcur = locs_pred.shape[0]
            truth = jnp.swapaxes(loc_true, 0, 1)[:tcur]   # [T', B, N, 3]

            b, nn = loc_true.shape[0], loc_true.shape[2]
            corr, avg_steps, _ = pearson_correlation_batch(
                locs_pred.reshape(tcur, -1, 3), truth.reshape(tcur, -1, 3), nn)

            sup = min(cut, tcur)
            losses = ((locs_pred[:sup] - truth[:sup]) ** 2).mean(axis=(1, 2, 3))
            loss = losses.mean()

            tot_loss += float(loss) * b
            tot_steps += float(avg_steps) * b
            count += b
            targets_l.append(np.asarray(jnp.swapaxes(truth, 0, 1)))
            preds_l.append(np.asarray(jnp.swapaxes(locs_pred[:sup], 0, 1)))
            energies_l.append(np.asarray(jnp.swapaxes(energies[:sup], 0, 1)))

        test_loss = tot_loss / count
        artifact = {
            "targets": np.concatenate(targets_l),
            "preds": np.concatenate(preds_l),
            "energy_conservation": np.concatenate(energies_l),
            "test_loss": test_loss,
        }
        artifact.update(_finite_metrics(artifact))
        return test_loss, tot_steps / count, artifact


@dataclasses.dataclass(eq=False)
class SEGNOExperiment:
    """SEGNO training/eval/rollout (SEGNO/train_nbody.py semantics)."""

    model: SEGNO
    num_timesteps: int = 10
    lr: float = 5e-3
    weight_decay: float = 1e-12
    compute_dtype: Any = None        # see EGNOExperiment.compute_dtype:
    #                                  fp32 master weights + Adam state,
    #                                  fwd/bwd in e.g. bf16, fp32 loss
    mesh: Any = None                 # see EGNOExperiment.mesh
    shard_particles: bool = False

    def __post_init__(self):
        self.optimizer = adam_l2(self.lr, self.weight_decay)

    def _constrain(self, batch):
        """Pin the batch tuple's sharding over the mesh (no-op without one).
        SEGNO batches are (loc_in, vel_in, charges, w, loc_end) with the
        batch axis at 0 (single input) or 1 (multi input [L, B, N, 3])."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        sp = "space" if self.shard_particles else None
        loc_in, vel_in, charges, w, loc_end = batch
        d_in = (P(None, "data", sp) if loc_in.ndim == 4
                else P("data", sp))
        specs = (d_in, d_in, P("data", sp), P("data", sp), P("data", sp))
        return tuple(
            jax.lax.with_sharding_constraint(b, NamedSharding(self.mesh, s))
            for b, s in zip(batch, specs))

    def init(self, key):
        params = self.model.init(key)
        return params, self.optimizer.init(params)

    def sample_steps(self, ds: NBodyDataset, rng: np.random.RandomState,
                     varDT: bool):
        """One draw of input segment lengths (train_nbody.py:97-102)."""
        L, T = ds.num_inputs, self.num_timesteps
        if L <= 1:
            return None
        if varDT:
            steps = rng.randint(1, max(T // L, 2), size=L - 1).tolist()
        else:
            steps = [T // L] * (L - 1)
        return tuple(steps)

    def max_interior(self, ds: NBodyDataset) -> int:
        """Static upper bound on any varDT interior segment length
        (train_nbody.py:100 samples in [1, T//L))."""
        return max(self.num_timesteps // ds.num_inputs, 2)

    def sample_steps_batched(self, ds: NBodyDataset,
                             rng: np.random.RandomState, varDT: bool,
                             num_batches: int):
        """PER-BATCH input segment lengths [NB, L-1], matching the
        reference's per-batch resampling granularity inside run_epoch
        (train_nbody.py:97-102). Returns None for single-input."""
        L, T = ds.num_inputs, self.num_timesteps
        if L <= 1:
            return None
        if varDT:
            return rng.randint(1, max(T // L, 2),
                               size=(num_batches, L - 1)).astype(np.int32)
        return np.full((num_batches, L - 1), T // L, np.int32)

    def frames_from_steps(self, ds: NBodyDataset, steps: np.ndarray):
        """Vectorized absolute input frames per batch
        (train_nbody.py:103-114): frames [NB, L], ascending; pushed to
        frame 0 when the window would start before the trajectory."""
        nb = steps.shape[0]
        cum = np.cumsum(
            np.concatenate([np.zeros((nb, 1), np.int32), steps], axis=1),
            axis=1)
        idxs = np.flip(ds.start - cum, axis=1)
        mins = idxs.min(axis=1, keepdims=True)
        idxs = np.where(mins < 0, idxs - mins, idxs)
        return np.ascontiguousarray(idxs).astype(np.int32)

    def input_frames(self, ds: NBodyDataset, steps):
        """Absolute input frames + in_steps offsets (train_nbody.py:103-114)."""
        start = ds.start
        if steps is None:
            return (start,), None, start + self.num_timesteps
        indices = np.flip(start - np.cumsum([0] + list(steps)))
        if (indices < 0).any():
            indices = indices - indices.min()
            start = indices.min()
        end = int(indices[-1]) + self.num_timesteps
        in_steps = tuple(int(i - start) for i in indices)
        return tuple(int(i) for i in indices), in_steps, end

    def _forward(self, params, his, loc, vel, edge_attr, in_steps):
        return self.model(params, his, loc, vel, edge_attr,
                          T=self.num_timesteps, in_steps=in_steps)

    def _features(self, loc, vel, charges, w):
        """h = |v|; edge_attr = [q_i q_j, ||x_i - x_j||^2] using the LAST
        input frame's positions for multi-input (train_nbody.py:115-123)."""
        speed = jnp.sqrt((vel ** 2).sum(-1, keepdims=True))
        loc_last = loc[-1] if loc.ndim == 4 else loc
        diff = loc_last[..., :, None, :] - loc_last[..., None, :, :]
        dist = (diff ** 2).sum(-1, keepdims=True)
        edge_attr = jnp.concatenate(
            [jnp.broadcast_to(w, dist.shape), dist], axis=-1)
        return speed, edge_attr

    def _loss(self, params, batch, in_steps):
        loc_in, vel_in, charges, w, loc_end = batch
        if self.compute_dtype is not None:
            cast = lambda a: a.astype(self.compute_dtype)
            params = jax.tree.map(cast, params)
            loc_in, vel_in, charges, w = map(cast, (loc_in, vel_in, charges, w))
        his, edge_attr = self._features(loc_in, vel_in, charges, w)
        x, _, _ = self._forward(params, his, loc_in, vel_in, edge_attr, in_steps)
        return ((x.astype(jnp.float32) - loc_end) ** 2).mean()

    @functools.partial(jax.jit, static_argnums=(0, 5, 6), donate_argnums=(1, 2))
    def train_epoch(self, params, opt_state, ds_arrays, perm, frames, in_steps):
        end = (frames[-1] if in_steps else frames[0]) + self.num_timesteps

        def body(carry, idx):
            params, opt_state = carry
            batch = self._make_batch(ds_arrays, idx, frames, in_steps, end)
            loss, grads = jax.value_and_grad(self._loss)(params, batch, in_steps)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), perm)
        return params, opt_state, losses

    def _make_batch(self, ds_arrays, idx, frames, in_steps, end):
        loc_all, vel_all, charges_all, w_all = ds_arrays
        if in_steps:
            loc_in = jnp.stack([loc_all[idx, f] for f in frames])  # [L, B, N, 3]
            vel_in = jnp.stack([vel_all[idx, f] for f in frames])
        else:
            loc_in = loc_all[idx, frames[0]]
            vel_in = vel_all[idx, frames[0]]
        return self._constrain(
            (loc_in, vel_in, charges_all[idx], w_all[idx], loc_all[idx, end]))

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def eval_epoch(self, params, ds_arrays, perm, frames, in_steps):
        end = (frames[-1] if in_steps else frames[0]) + self.num_timesteps

        def body(_, idx):
            batch = self._make_batch(ds_arrays, idx, frames, in_steps, end)
            return None, self._loss(params, batch, in_steps)

        _, losses = jax.lax.scan(body, None, perm)
        return losses

    # ---------- per-batch varDT path (dynamic segment lengths) ----------

    def _make_batch_dynamic(self, ds_arrays, idx, frames_b):
        """Batch gather with TRACED input frames frames_b [L] (ascending)."""
        loc_all, vel_all, charges_all, w_all = ds_arrays
        loc_in = loc_all[idx[None, :], frames_b[:, None]]   # [L, B, N, 3]
        vel_in = vel_all[idx[None, :], frames_b[:, None]]
        loc_end = loc_all[idx, frames_b[-1] + self.num_timesteps]
        return self._constrain(
            (loc_in, vel_in, charges_all[idx], w_all[idx], loc_end))

    def _loss_dynamic(self, params, batch, seg_lens, max_interior):
        loc_in, vel_in, charges, w, loc_end = batch
        if self.compute_dtype is not None:
            cast = lambda a: a.astype(self.compute_dtype)
            params = jax.tree.map(cast, params)
            loc_in, vel_in, charges, w = map(cast, (loc_in, vel_in, charges, w))
        his, edge_attr = self._features(loc_in, vel_in, charges, w)
        x, _, _ = self.model.forward_dynamic(
            params, his, loc_in, vel_in, edge_attr, seg_lens,
            T=self.num_timesteps, max_interior=max_interior)
        return ((x.astype(jnp.float32) - loc_end) ** 2).mean()

    @functools.partial(jax.jit, static_argnums=(0, 6),
                       donate_argnums=(1, 2))
    def train_epoch_dynamic(self, params, opt_state, ds_arrays, perm, frames,
                            max_interior):
        """Multi-input epoch with PER-BATCH segment lengths (the reference's
        varDT granularity, train_nbody.py:97-116). frames: [NB, L] absolute
        input frames per batch; segment lengths are their diffs."""

        def body(carry, scan_in):
            idx, frames_b = scan_in
            params, opt_state = carry
            batch = self._make_batch_dynamic(ds_arrays, idx, frames_b)
            seg_lens = jnp.diff(frames_b)
            loss, grads = jax.value_and_grad(self._loss_dynamic)(
                params, batch, seg_lens, max_interior)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (perm, frames))
        return params, opt_state, losses

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def eval_epoch_dynamic(self, params, ds_arrays, perm, max_interior,
                           frames):
        def body(_, scan_in):
            idx, frames_b = scan_in
            batch = self._make_batch_dynamic(ds_arrays, idx, frames_b)
            return None, self._loss_dynamic(params, batch,
                                            jnp.diff(frames_b), max_interior)

        _, losses = jax.lax.scan(body, None, (perm, frames))
        return losses

    def rollout(self, params, batch, traj_len: int, in_steps, dataset_kind: str):
        """Autoregressive rollout (train_nbody.py:200-236): feed each window's
        prediction back; with multi-input keep a sliding window of the last L
        states. Returns (locs_pred [traj_len, B, N, 3], energies [traj_len, B, 1])."""
        loc, vel, charges, w, _ = batch
        t = self.num_timesteps

        def window(carry, cur_in_steps):
            loc, vel = carry
            his, edge_attr = self._features(loc, vel, charges, w)
            x, _, v = self._forward(params, his, loc, vel, edge_attr,
                                    cur_in_steps)
            e = conserved_energy(dataset_kind, x, v, charges)
            if in_steps:
                loc = jnp.concatenate([loc[1:], x[None]], axis=0)
                vel = jnp.concatenate([vel[1:], v[None]], axis=0)
            else:
                loc, vel = x, v
            return (loc, vel), (x, e)

        if not in_steps:
            # single input: identical windows -> lax.scan
            def body(carry, _):
                return window(carry, None)
            _, (xs, es) = jax.lax.scan(body, (loc, vel), None,
                                       length=traj_len)
            return xs, es[..., None]

        # multi-input: in_steps shifts each window (sliding window of
        # predictions, train_nbody.py:220-226) and reaches its fixed point
        # (-(L-1)*T, ..., -T, 0) after L-1 windows; unroll until then, scan
        # the stable remainder.
        xs_parts, es_parts = [], []
        cur_in_steps = in_steps
        carry = (loc, vel)
        done = 0
        while done < traj_len:
            nxt = tuple(s - t for s in (list(cur_in_steps[1:]) + [t]))
            if nxt == cur_in_steps:
                break
            carry, (x0, e0) = window(carry, cur_in_steps)
            xs_parts.append(x0[None])
            es_parts.append(e0[None])
            cur_in_steps = nxt
            done += 1
        if done < traj_len:
            stable = cur_in_steps

            def body(carry, _):
                return window(carry, stable)

            carry, (xs, es) = jax.lax.scan(body, carry, None,
                                           length=traj_len - done)
            xs_parts.append(xs)
            es_parts.append(es)
        xs = jnp.concatenate(xs_parts, axis=0)
        es = jnp.concatenate(es_parts, axis=0)
        return xs, es[..., None]

    def test_rollout(self, params, ds: NBodyDataset, batch_size: int,
                     rng: np.random.RandomState, traj_len: int, varDT: bool):
        t = self.num_timesteps
        # Uniform window count across batches, sized for the worst-case
        # start any batch's sampled window could have (the reference
        # truncates per batch, train_nbody.py:137-138, and would then crash
        # concatenating unequal horizons — documented divergence).
        L = ds.num_inputs
        max_start = ds.start if L <= 1 else max(
            ds.start, (L - 1) * (self.max_interior(ds) - 1))
        tl = max(min(traj_len, (ds.n_frames - 1 - max_start) // t), 1)

        ds_arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
        roll_cache = {}

        n = len(ds)
        tot_loss = tot_steps = count = 0.0
        targets_l, preds_l, energies_l = [], [], []
        for s0 in range(0, n - batch_size + 1, batch_size):
            # per-batch window resampling, reference granularity
            # (train_nbody.py:97-116 runs inside the batch loop)
            steps = self.sample_steps(ds, rng, varDT)
            frames, in_steps, end = self.input_frames(ds, steps)
            # target frames anchor at the reference's post-shift `start`
            # (train_nbody.py:104-107,136-137): the dataset start when the
            # window fits before it (charged, start=30 — equals frames[-1]),
            # else the pushed-forward FIRST input frame (gravity multi-input,
            # start=0). The shifted case reproduces the reference's own
            # off-by-sum(steps) target anchoring (predictions physically
            # leave from frames[-1], not frames[0]) — kept for metric parity.
            shifted = in_steps and (frames[-1] - frames[0]) > ds.start
            start = int(frames[0]) if shifted else \
                (int(frames[-1]) if in_steps else int(frames[0]))
            pred_indices = start + np.cumsum([t] * tl)
            if in_steps not in roll_cache:
                roll_cache[in_steps] = jax.jit(
                    lambda p, b, ins=in_steps: self.rollout(
                        p, b, tl, ins, ds.dataset))
            roll_fn = roll_cache[in_steps]
            idx = jnp.arange(s0, s0 + batch_size)
            batch = self._make_batch(ds_arrays, idx, tuple(int(f) for f in frames),
                                     in_steps, int(frames[-1]) + t)
            locs_pred, energies = roll_fn(params, batch)
            loc_all = ds.loc
            truth = jnp.stack([loc_all[idx, int(f)] for f in pred_indices])

            b, nn = len(idx), ds.n_balls
            corr, avg_steps, _ = pearson_correlation_batch(
                locs_pred.reshape(tl, -1, 3), truth.reshape(tl, -1, 3), nn)
            losses = ((locs_pred - truth) ** 2).mean(axis=(1, 2, 3))
            loss = losses.mean()
            tot_loss += float(loss) * b
            tot_steps += float(avg_steps) * b
            count += b
            targets_l.append(np.asarray(jnp.swapaxes(truth, 0, 1)))
            preds_l.append(np.asarray(jnp.swapaxes(locs_pred, 0, 1)))
            energies_l.append(np.asarray(jnp.swapaxes(energies, 0, 1)))

        test_loss = tot_loss / count
        artifact = {
            "targets": np.concatenate(targets_l),
            "preds": np.concatenate(preds_l),
            "energy_conservation": np.concatenate(energies_l),
            "test_loss": test_loss,
        }
        artifact.update(_finite_metrics(artifact))
        return test_loss, tot_steps / count, artifact


def make_perm(rng: np.random.RandomState, n: int, batch_size: int,
              shuffle: bool = True) -> np.ndarray:
    """[num_batches, B] index array; drop_last=True like the reference
    train loaders."""
    idx = rng.permutation(n) if shuffle else np.arange(n)
    nb = n // batch_size
    return idx[: nb * batch_size].reshape(nb, batch_size).astype(np.int32)
