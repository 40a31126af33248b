"""Dataset layer tests: file-format compatibility, windowing semantics,
varDT sampling properties."""

import numpy as np
import pytest

from nonode_tpu.data.nbody import NBodyDataset, random_ascending


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Write a tiny reference-layout charged dataset."""
    d = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    s, f, n = 12, 60, 5
    loc = rng.randn(s, f, 3, n).astype(np.float32)       # reference layout
    vel = rng.randn(s, f, 3, n).astype(np.float32)
    charges = rng.choice([-1.0, 1.0], size=(s, n, 1)).astype(np.float32)
    edges = np.einsum("sik,sjk->sij", charges, charges)
    for name, arr in [("loc", loc), ("vel", vel), ("edges", edges),
                      ("charges", charges)]:
        np.save(d / f"{name}_train_charged5_initvel1small.npy", arr)
    return d, loc, vel, charges


class TestNBodyDataset:
    def test_load_transposes_charged_layout(self, data_dir):
        d, loc, vel, charges = data_dir
        ds = NBodyDataset(data_dir=d, partition="train", dataset="charged")
        assert ds.loc.shape == (12, 60, 5, 3)
        np.testing.assert_allclose(np.asarray(ds.loc[3, 7]), loc[3, 7].T,
                                   rtol=1e-6)

    def test_edge_weights_are_charge_products(self, data_dir):
        d, loc, vel, charges = data_dir
        ds = NBodyDataset(data_dir=d, partition="train", dataset="charged")
        w = np.asarray(ds.edge_weights)
        assert w.shape == (12, 5, 5, 1)
        np.testing.assert_allclose(
            w[2, :, :, 0], charges[2] @ charges[2].T, rtol=1e-6)

    def test_out_indices_default(self, data_dir):
        d, *_ = data_dir
        ds = NBodyDataset(data_dir=d, partition="train", dataset="charged",
                          num_timesteps=10, traj_len=1, dT=1)
        # charged starts at frame 30: outputs 31..40
        np.testing.assert_array_equal(ds.out_indices(), np.arange(31, 41))

    def test_out_indices_truncated_at_trajectory_end(self, data_dir):
        d, *_ = data_dir
        ds = NBodyDataset(data_dir=d, partition="train", dataset="charged",
                          num_timesteps=10, traj_len=5, dT=1)
        idx = ds.out_indices()
        assert idx.max() == 59  # 60 frames -> last valid index 59
        np.testing.assert_array_equal(idx, np.arange(31, 60))

    def test_out_indices_dt(self, data_dir):
        d, *_ = data_dir
        ds = NBodyDataset(data_dir=d, partition="train", dataset="charged",
                          num_timesteps=10, traj_len=1, dT=2)
        np.testing.assert_array_equal(ds.out_indices(),
                                      np.arange(31, 51, 2))

    def test_max_samples(self, data_dir):
        d, *_ = data_dir
        ds = NBodyDataset(data_dir=d, partition="train", dataset="charged",
                          max_samples=5)
        assert len(ds) == 5

    def test_input_offsets_equispaced(self, data_dir):
        d, *_ = data_dir
        ds = NBodyDataset(data_dir=d, partition="train", dataset="charged",
                          num_timesteps=10, num_inputs=3, dT=1)
        frames, t_in = ds.sample_input_offsets(np.random.RandomState(0))
        np.testing.assert_array_equal(frames[0], [28, 29, 30])
        np.testing.assert_array_equal(t_in[0], [-2, -1, 0])
        assert (frames == frames[0]).all()  # equispaced: same for all samples

    def test_input_offsets_vardt(self, data_dir):
        d, *_ = data_dir
        ds = NBodyDataset(data_dir=d, partition="train", dataset="charged",
                          num_timesteps=10, num_inputs=3, varDT=True)
        frames, t_in = ds.sample_input_offsets(np.random.RandomState(0))
        assert frames.shape == (12, 3)
        # ascending, last offset 0, all within [1, T-1] backwards
        assert (np.diff(frames, axis=1) > 0).all()
        assert (t_in[:, -1] == 0).all()
        assert (t_in[:, 0] >= -(10 - 1)).all()
        assert (frames >= 0).all()


class TestRandomAscending:
    def test_properties(self):
        rng = np.random.RandomState(1)
        for _ in range(20):
            v = random_ascending(rng, 3, 1, 9)
            assert len(v) == 3
            assert (np.diff(v) > 0).all()
            assert v.min() >= 1 and v.max() <= 9
