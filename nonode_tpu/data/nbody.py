"""N-body dataset layer — device-resident, densely batched.

Consumes the reference's ``.npy`` file layout bit-for-bit
(``{loc,vel,edges,charges}_{train,valid,test}_{dataset}{n}_initvel1{suffix}.npy``,
generate_dataset.py:134-147), including its quirks:

- charged files store loc/vel as [S, T, 3, N] (transposed on load exactly as
  EGNO/simulation/dataset_simple.py:39-43);
- for gravity, the ``charges`` file actually stores masses and the ``edges``
  file stores forces (synthetic_sim.py:404 consumed at
  generate_dataset.py:73,89) — like the reference train loops, only
  charges/masses are used and pair weights are their products.

TPU-first design difference: instead of a torch DataLoader + per-batch
python collate + ``get_edges`` list building (dataset_simple.py:101-111), the
whole split lives on device as dense arrays and batches are device-side
gathers; edges are implicit (complete graph) and pair weights are the dense
``q q^T`` [S, N, N] tensor.

Windowing semantics mirror NBodyDynamicsDataset.__getitem__
(dataset_simple.py:128-163): frame_0 = 30 (charged) / 0 (gravity); output
frames ``arange(frame_0+1, frame_0 + T*traj_len*dT + 1, dT)`` truncated at
trajectory end; varDT multi-input sampling via random ascending offsets.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

FRAME0 = {"charged": {"nbody": 6, "nbody_small": 30, "nbody_small_out_dist": 20},
          "gravity": {"nbody": 0, "nbody_small": 0, "nbody_small_out_dist": 0}}


def random_ascending(rng: np.random.RandomState, length, min_value, max_value):
    """Unique ascending random ints in [min_value, max_value] (root
    utils.py:15-31)."""
    vals = rng.permutation(max_value - min_value + 1)[:length] + min_value
    return np.sort(vals)


@dataclasses.dataclass
class NBodyDataset:
    data_dir: Path
    partition: str = "train"          # train | val | test
    dataset: str = "charged"          # charged | gravity
    dataset_name: str = "nbody_small"
    n_balls: int = 5
    max_samples: int = int(1e8)
    num_timesteps: int = 10
    num_inputs: int = 1
    traj_len: int = 1
    dT: int = 1
    varDT: bool = False

    def __post_init__(self):
        suffix = "valid" if self.partition == "val" else self.partition
        if self.dataset_name == "nbody":
            suffix += f"_{self.dataset}{self.n_balls}_initvel1"
        elif self.dataset_name in ("nbody_small", "nbody_small_out_dist"):
            suffix += f"_{self.dataset}{self.n_balls}_initvel1small"
        else:
            raise ValueError(f"Wrong dataset name {self.dataset_name}")
        self.suffix = suffix

        d = Path(self.data_dir)
        loc = np.load(d / f"loc_{suffix}.npy").astype(np.float32)
        vel = np.load(d / f"vel_{suffix}.npy").astype(np.float32)
        charges = np.load(d / f"charges_{suffix}.npy").astype(np.float32)
        if loc.shape[-2:] != (self.n_balls, 3):
            loc = np.transpose(loc, (0, 1, 3, 2))
            vel = np.transpose(vel, (0, 1, 3, 2))
            assert loc.shape[-2:] == (self.n_balls, 3), "Shape mismatch!"
        if self.dataset == "gravity":
            assert (charges > 0).all(), \
                "Charges (i.e. masses) in gravity dataset should be positive"

        s = min(self.max_samples, loc.shape[0])
        loc, vel, charges = loc[:s], vel[:s], charges[:s]
        if charges.ndim == 2:
            charges = charges[..., None]

        self.start = FRAME0[self.dataset][self.dataset_name]
        self.n_frames = loc.shape[1]
        # Guards ONLY the empty-window case (zero frames after frame_0): fail
        # loudly instead of a zero-width gather deep in jit (the reference
        # would IndexError on loc[frame_0] the same way). A dataset with
        # start+1 < n_frames < start + T*traj_len*dT still loads: out_indices
        # truncates the window, matching the reference's idx[idx < n_frames]
        # (dataset_simple.py:156-158).
        assert self.start + 1 < self.n_frames, (
            f"dataset has no frames after the window start: {self.n_frames} "
            f"saved frames but {self.dataset}/{self.dataset_name} windows "
            f"start at frame {self.start} (dataset_simple.py:122-123); a "
            f"full untruncated window needs length >= "
            f"{(self.start + self.num_timesteps) * 100 + 100} "
            f"(sample_freq 100)")
        # device-resident split
        self.loc = jnp.asarray(loc)                     # [S, F, N, 3]
        self.vel = jnp.asarray(vel)
        self.charges = jnp.asarray(charges)             # [S, N, 1]
        # dense pair weights w_ij = q_i * q_j (dataset_simple.py:47-48)
        self.edge_weights = jnp.asarray(
            np.einsum("sik,sjk->sij", charges, charges)[..., None])  # [S,N,N,1]

    def __len__(self):
        return int(self.loc.shape[0])

    @property
    def n_nodes(self):
        return self.n_balls

    def out_indices(self, frame_0=None):
        """Static output frame indices (identical across samples when not
        varDT): arange(f0+1, f0 + T*traj_len*dT + 1, dT), truncated at the
        trajectory end (dataset_simple.py:151-158)."""
        f0 = self.start if frame_0 is None else frame_0
        frame_t = self.start + self.num_timesteps * self.traj_len * self.dT
        idx = np.arange(f0 + 1, frame_t + 1, self.dT)
        return idx[idx < self.n_frames]

    def sample_input_offsets(self, rng: np.random.RandomState):
        """Per-sample input frame indices for num_inputs > 1.

        Returns (frames [S, L] absolute input frames ascending,
                 timesteps_in [S, L] offsets relative to the last input).
        For varDT the offsets are random ascending per sample
        (dataset_simple.py:137-150); otherwise equispaced by dT.
        """
        s, L, T = len(self), self.num_inputs, self.num_timesteps
        if not self.varDT:
            base = (np.arange(T) * self.dT)[:L]
            t_in = -base[::-1]
            t_in = np.broadcast_to(t_in, (s, L)).copy()
        else:
            t_in = np.stack([
                np.concatenate([[0], random_ascending(rng, L - 1, 1, T - 1)])
                for _ in range(s)])
            t_in = -t_in[:, ::-1]
        # NOTE the reference multiplies by dT a second time here
        # (dataset_simple.py:146: frame_0 + timesteps_in * dT where the
        # equispaced offsets already include dT) — replicated faithfully.
        frames = self.start + t_in * self.dT
        # push windows starting before frame 0 forward (dataset_simple.py:147-150)
        shift = np.maximum(-frames.min(axis=1, keepdims=True), 0)
        frames = frames + shift
        # PER-SAMPLE relative timesteps (each sample anchored at its own
        # last input frame). The reference instead subtracts the BATCH-wide
        # in_indices.max() (main_simulation_simple_no.py:208-209); the
        # batch-dependent correction last_i - max_batch(last) is applied
        # inside EGNOExperiment._batch at gather time, where the batch
        # membership is known.
        t_in_rel = (frames - frames[:, -1:]).astype(np.float32)
        return frames, t_in_rel
