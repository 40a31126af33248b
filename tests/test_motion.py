"""Mocap workload tests: parser FK, dense edge construction, dataset parity
with the reference torch implementation on the in-repo motion_run.pkl."""

import os
import pickle

import numpy as np
import pytest

from nonode_tpu.data.amc import (euler2mat, parse_amc, parse_asf,
                                 trajectories_from_amc)
from nonode_tpu.data.motion import (MotionDataset, MotionDynamicsDataset,
                                    build_edge_matrices)

REF_MOTION = "/root/reference/EGNO/motion/dataset"


class TestEuler:
    def test_identity(self):
        np.testing.assert_allclose(euler2mat(0, 0, 0), np.eye(3), atol=1e-12)

    def test_matches_scipy_extrinsic_xyz(self):
        scipy = pytest.importorskip("scipy.spatial.transform")
        rng = np.random.RandomState(0)
        for _ in range(5):
            a = rng.uniform(-np.pi, np.pi, 3)
            want = scipy.Rotation.from_euler("xyz", a).as_matrix()
            np.testing.assert_allclose(euler2mat(*a), want, atol=1e-10)


ASF = """:version 1.10
:name test
:units
:documentation
:root
:bonedata
  begin
     id 1
     name bone1
     direction 1 0 0
     length 2
     axis 0 0 0 XYZ
    dof rx ry rz
    limits (-180.0 180.0)
           (-180.0 180.0)
           (-180.0 180.0)
  end
  begin
     id 2
     name bone2
     direction 0 1 0
     length 3
     axis 0 0 0 XYZ
    dof rz
    limits (-10.0 10.0)
  end
:hierarchy
  begin
    root bone1
    bone1 bone2
  end
"""

AMC = """#!Comment
:FULLY-SPECIFIED
:DEGREES
1
root 0 0 0 0 0 0
bone1 0 0 0
bone2 0
2
root 1 2 3 0 0 90
bone1 0 0 0
bone2 0
"""


class TestParser:
    @pytest.fixture
    def files(self, tmp_path):
        asf = tmp_path / "test.asf"
        amc = tmp_path / "test.amc"
        asf.write_text(ASF)
        amc.write_text(AMC)
        return asf, amc

    def test_parse_asf(self, files):
        asf, _ = files
        joints = parse_asf(asf)
        assert set(joints) == {"root", "bone1", "bone2"}
        assert joints["bone1"].parent is joints["root"]
        assert joints["bone2"].parent is joints["bone1"]
        assert joints["bone1"].length == 2

    def test_parse_amc(self, files):
        _, amc = files
        frames = parse_amc(amc)
        assert len(frames) == 2
        assert frames[1]["root"] == [1, 2, 3, 0, 0, 90]

    def test_forward_kinematics(self, files):
        asf, amc = files
        edges, all_x = trajectories_from_amc(asf, [amc])
        x = all_x[0]
        assert x.shape == (2, 3, 3)
        # frame 0: root at origin; bone1 at 2*(1,0,0); bone2 at bone1 + 3*(0,1,0)
        np.testing.assert_allclose(x[0, 0], [0, 0, 0], atol=1e-10)
        np.testing.assert_allclose(x[0, 1], [2, 0, 0], atol=1e-10)
        np.testing.assert_allclose(x[0, 2], [2, 3, 0], atol=1e-10)
        # frame 1: root translated to (1,2,3), rotated 90deg about z:
        # bone1 direction (1,0,0) -> (0,1,0)
        np.testing.assert_allclose(x[1, 0], [1, 2, 3], atol=1e-10)
        np.testing.assert_allclose(x[1, 1], [1, 4, 3], atol=1e-8)
        # bone2 direction (0,1,0) rotated -> (-1,0,0)
        np.testing.assert_allclose(x[1, 2], [-2, 4, 3], atol=1e-8)
        assert edges == [[1, 0], [2, 1]]


class TestPreprocessQuirks:
    def _frames(self, n):
        body = "\n".join(
            f"{i + 1}\nroot 0 0 0 0 0 0\nbone1 0 0 0\nbone2 0"
            for i in range(n))
        return f"#!Comment\n:FULLY-SPECIFIED\n:DEGREES\n{body}\n"

    def test_special_case_10_drops_first_6_frames(self, tmp_path):
        """Trials whose AMC stem ends in _10 lose their first 6 frames
        (EGNO/motion/preprocess.py:22-24, 'is the special case!!!')."""
        asf = tmp_path / "test.asf"
        asf.write_text(ASF)
        normal = tmp_path / "walk_09.amc"
        special = tmp_path / "walk_10.amc"
        normal.write_text(self._frames(8))
        special.write_text(self._frames(8))
        _, trials = trajectories_from_amc(asf, [normal, special])
        assert trials[0].shape[0] == 8
        assert trials[1].shape[0] == 2

    def test_surplus_amc_channels_silently_dropped(self, tmp_path):
        """A bone with more AMC values than non-(0,0)-limit dof axes: the
        reference consumes values sequentially per axis and ignores extras
        (amc_parser.py:51-57) — must not broadcast-error."""
        asf = tmp_path / "test.asf"
        asf.write_text(ASF)
        a1 = tmp_path / "one.amc"
        a2 = tmp_path / "two.amc"
        a1.write_text(AMC)
        a2.write_text(AMC.replace("bone2 0", "bone2 0 45"))
        _, (x1,) = trajectories_from_amc(asf, [a1])
        _, (x2,) = trajectories_from_amc(asf, [a2])
        np.testing.assert_allclose(x2, x1, atol=0)


class TestEdgeMatrices:
    def test_chain(self):
        attr, mask = build_edge_matrices([[1, 0], [2, 1]], 3)
        assert attr[1, 0, 0] == 1 and attr[0, 1, 0] == 1
        assert attr[2, 1, 0] == 1
        assert attr[2, 0, 0] == 2 and attr[0, 2, 0] == 2  # 2-hop
        assert (np.diagonal(attr[..., 0]) == 0).all()
        assert mask.sum() == 6


@pytest.mark.skipif(not os.path.isdir(REF_MOTION),
                    reason="reference motion data not mounted")
class TestMotionRunParity:
    def test_dataset_matches_reference(self):
        ds = MotionDataset(data_dir=REF_MOTION, partition="train",
                           max_samples=100, delta_frame=30, case="run")
        assert ds.n_node == 31
        # parity against the reference's own torch implementation
        import sys
        sys.path.insert(0, "/root/reference/EGNO/motion")
        import importlib
        import dataset as ref_ds_mod
        importlib.reload(ref_ds_mod)
        ref = ref_ds_mod.MotionDataset(partition="train", max_samples=100,
                                       delta_frame=30, data_dir=REF_MOTION,
                                       case="run")
        np.testing.assert_allclose(np.asarray(ds.x_0), ref.x_0.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds.v_0), ref.v_0.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds.x_t), ref.x_t.numpy(),
                                   atol=1e-6)
        # dense edge matrices agree with the reference's sparse lists
        rows = ref.edges[0].numpy()
        cols = ref.edges[1].numpy()
        attrs = ref.edge_attr.numpy()[:, 0]
        dense = np.asarray(ds.edge_attr[..., 0])
        for r, c, a in zip(rows, cols, attrs):
            assert dense[r, c] == a
        # the mask must be set at EXACTLY the reference edge positions —
        # a right-count/wrong-cells mask would train on a wrong graph
        want = np.zeros_like(np.asarray(ds.edge_mask), bool)
        want[rows, cols] = True
        np.testing.assert_array_equal(np.asarray(ds.edge_mask) > 0, want)

    def test_dynamics_dataset(self):
        ds = MotionDynamicsDataset(data_dir=REF_MOTION, partition="val",
                                   max_samples=60, delta_frame=30, case="run",
                                   num_timesteps=6)
        assert ds.x_t.shape[1:] == (6, 31, 3)
        # last target frame equals the single-target dataset's x_t
        ds1 = MotionDataset(data_dir=REF_MOTION, partition="val",
                            max_samples=60, delta_frame=30, case="run")
        np.testing.assert_allclose(np.asarray(ds.x_t[:, -1]),
                                   np.asarray(ds1.x_t), atol=1e-6)

    def test_split_regeneration_matches_saved_reference_split(self, tmp_path):
        """Our split generation (np.random.seed(100), dataset.py:51-80
        semantics) must reproduce the reference's committed split_run.pkl
        bit-for-bit when regenerated from scratch."""
        import pickle
        import shutil
        from pathlib import Path
        from nonode_tpu.data.motion import _load_split
        ref_dir = Path(REF_MOTION)
        with open(ref_dir / "split_run.pkl", "rb") as f:
            ref_split = pickle.load(f)
        shutil.copy(ref_dir / "motion_run.pkl", tmp_path / "motion_run.pkl")
        ours = _load_split(tmp_path, "run")
        for part in range(3):
            assert set(ref_split[part]) == set(ours[part])
            for k in ref_split[part]:
                np.testing.assert_array_equal(
                    np.asarray(ref_split[part][k]), np.asarray(ours[part][k]))

    def test_egno_trains_on_motion(self):
        """End-to-end: EGNO decodes mocap frames with the skeleton edge mask."""
        import jax
        import jax.numpy as jnp
        from nonode_tpu.models.egno import EGNO
        ds = MotionDynamicsDataset(data_dir=REF_MOTION, partition="train",
                                   max_samples=40, delta_frame=30, case="run",
                                   num_timesteps=4)
        model = EGNO(n_layers=1, in_node_nf=1, in_edge_nf=1, hidden_nf=16,
                     num_timesteps=4, time_emb_dim=8, num_modes=2)
        params = model.init(jax.random.PRNGKey(0))
        b = 8
        x0, v0 = ds.x_0[:b], ds.v_0[:b]
        nodes = ds.node_features(x0)
        e_attr = jnp.broadcast_to(ds.edge_attr, (b, *ds.edge_attr.shape))
        loc_mean = x0.mean(axis=1, keepdims=True).repeat(ds.n_node, 1)
        x, v, h = model(params, x0, v0, nodes, e_attr, loc_mean,
                        edge_mask=ds.edge_mask)
        assert x.shape == (4, b, 31, 3)
        loss = float(((jnp.swapaxes(x, 0, 1) - ds.x_t[:b]) ** 2).mean())
        assert np.isfinite(loss)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF_MOTION),
                    reason="reference mocap dataset unavailable")
class TestMotionDriver:
    def test_motion_main_end_to_end(self, tmp_path):
        """motion_main end to end on the real mocap data: results JSON +
        a registry-parsable trajectory artifact with per-timestep decode
        curves (the mocap analogue of the nbody drivers' artifact
        contract)."""
        from nonode_tpu.analysis.registry import FNAME_RE
        from nonode_tpu.motion_main import get_args, main

        best_val, test_loss = main(get_args([
            "--data_dir", REF_MOTION, "--epochs", "3", "--test_interval", "2",
            "--batch_size", "8", "--max_training_samples", "24",
            "--n_layers", "1", "--nf", "16", "--num_timesteps", "4",
            "--seed", "3", "--outf", str(tmp_path)]))
        assert np.isfinite(best_val) and np.isfinite(test_loss)
        arts = list((tmp_path / "mocap_exp").glob("*_results.npz"))
        assert len(arts) == 1
        m = FNAME_RE.match(arts[0].name)
        assert m and m["dataset"] == "motion_run" and m["seed"] == "3"
        d = np.load(arts[0])
        assert d["preds"].shape == d["targets"].shape
        assert d["preds"].shape[1:] == (4, 31, 3)
        # artifact test_loss must equal the decode MSE over the same batches
        mse = float(((d["preds"] - d["targets"]) ** 2).mean())
        np.testing.assert_allclose(mse, float(d["test_loss"]), rtol=1e-5)
