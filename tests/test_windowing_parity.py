"""Windowing-arithmetic parity: NBodyDataset's input/output frame indexing
vs the reference NBodyDynamicsDataset.__getitem__ (the fiddliest index code
in the repo: multi-input offsets, the double-dT quirk, negative-start
shifting, truncation)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

from nonode_tpu.data.nbody import NBodyDataset


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("winparity")
    rng = np.random.RandomState(0)
    s, f, n = 6, 199, 5
    loc = rng.randn(s, f, 3, n).astype(np.float32)
    vel = rng.randn(s, f, 3, n).astype(np.float32)
    charges = rng.choice([-1.0, 1.0], size=(s, n, 1)).astype(np.float32)
    edges = np.einsum("sik,sjk->sij", charges, charges)
    for name, arr in [("loc", loc), ("vel", vel), ("edges", edges),
                      ("charges", charges)]:
        np.save(d / f"{name}_train_charged5_initvel1small.npy", arr)
    return d


@pytest.fixture(scope="module")
def ref_dataset_cls():
    for name in ("torch_geometric", "torch_geometric.utils", "wandb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torch_geometric.utils"].to_dense_batch = None
    sys.modules["torch_geometric"].utils = sys.modules["torch_geometric.utils"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from EGNO.simulation.dataset_simple import NBodyDynamicsDataset
    return NBodyDynamicsDataset


@pytest.mark.parametrize("num_inputs,dT,traj_len", [
    (1, 1, 1), (1, 2, 1), (1, 1, 20), (2, 1, 1), (3, 1, 1), (2, 2, 1)])
def test_equispaced_windowing_matches_reference(fixture_dir, ref_dataset_cls,
                                                num_inputs, dT, traj_len):
    ref_ds = ref_dataset_cls(partition="train", data_dir=fixture_dir,
                             dataset="charged", n_balls=5, num_timesteps=10,
                             num_inputs=num_inputs, traj_len=traj_len, dT=dT,
                             varDT=False)
    ours = NBodyDataset(data_dir=fixture_dir, partition="train",
                        dataset="charged", n_balls=5, num_timesteps=10,
                        num_inputs=num_inputs, traj_len=traj_len, dT=dT,
                        varDT=False)
    frames, t_in = (ours.sample_input_offsets(np.random.RandomState(0))
                    if num_inputs > 1
                    else (np.full((len(ours), 1), ours.start), None))
    out_base = ours.out_indices()

    for i in range(3):
        loc0, vel0, edge_attr, charges, locs_out, frame_0, out_indices = \
            ref_ds[i]
        ref_frames = np.atleast_1d(np.asarray(frame_0))
        np.testing.assert_array_equal(frames[i], ref_frames)
        np.testing.assert_array_equal(out_base + (frames[i][-1] - ours.start),
                                      np.asarray(out_indices))
        # input state gather agrees
        ref_loc0 = np.asarray(loc0)
        if num_inputs == 1:
            ref_loc0 = ref_loc0[None]
        got = np.asarray(ours.loc[i])[frames[i]]
        np.testing.assert_allclose(got, ref_loc0, rtol=1e-6)
        # output targets agree ([N, T', 3] in the reference)
        got_out = np.asarray(ours.loc[i])[out_base].transpose(1, 0, 2)
        np.testing.assert_allclose(got_out, np.asarray(locs_out), rtol=1e-6)


def test_vardt_windowing_matches_reference_with_pinned_sampler(
        fixture_dir, ref_dataset_cls, monkeypatch):
    """Pin the reference's random_ascending_tensor to fixed offsets and check
    the shift/truncation arithmetic matches ours for the same offsets."""
    import torch
    import EGNO.simulation.dataset_simple as ref_mod

    pinned = torch.tensor([3, 7])  # ascending offsets in [1, T-1]
    monkeypatch.setattr(ref_mod, "random_ascending_tensor",
                        lambda length, max_value, min_value: pinned[:length])

    ref_ds = ref_dataset_cls(partition="train", data_dir=fixture_dir,
                             dataset="charged", n_balls=5, num_timesteps=10,
                             num_inputs=3, traj_len=1, dT=1, varDT=True)
    _, _, _, _, locs_out, frame_0, out_indices = ref_ds[0]

    # pin OUR sampler to the same offsets and run the PRODUCTION index
    # path (NBodyDataset.sample_input_offsets through
    # EGNOExperiment.epoch_index_arrays) — not a re-transcription of the
    # shift arithmetic, which would let the implementation drift unpinned
    import nonode_tpu.data.nbody as nbody_mod
    from nonode_tpu.models.egno import EGNO
    from nonode_tpu.train.loop import EGNOExperiment

    monkeypatch.setattr(
        nbody_mod, "random_ascending",
        lambda rng, length, mn, mx: np.array([3, 7])[:length])
    ours = NBodyDataset(partition="train", data_dir=fixture_dir,
                        dataset="charged", n_balls=5, num_timesteps=10,
                        num_inputs=3, traj_len=1, varDT=True)
    exp = EGNOExperiment(EGNO(n_layers=1, hidden_nf=8, num_timesteps=10,
                              time_emb_dim=4, num_modes=2, num_inputs=3))
    idx = exp.epoch_index_arrays(ours, np.random.RandomState(0))
    np.testing.assert_array_equal(idx["frames_in"][0], np.asarray(frame_0))
    np.testing.assert_array_equal(idx["out_frames"][0],
                                  np.asarray(out_indices))
