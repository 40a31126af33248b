"""Golden-parity tests: nonode_tpu vs the reference PyTorch implementation.

Loads the reference modules from /root/reference (read-only), ports their
randomly-initialized weights into nonode_tpu param pytrees via
nonode_tpu.compat, and checks forward outputs agree to float32 tolerance on
identical inputs. Skipped when the reference tree is not mounted.
"""

import os
import sys
import types
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

from nonode_tpu.compat import (egno_params_from_state_dict,
                               segno_params_from_state_dict)
from nonode_tpu.models.egno import EGNO
from nonode_tpu.models.segno import SEGNO
from nonode_tpu.ops.dense_graph import EGNNLayer
from nonode_tpu.ops.spectral import SpectralConv


@pytest.fixture(scope="module")
def ref():
    for name in ("torch_geometric", "torch_geometric.utils", "wandb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torch_geometric.utils"].to_dense_batch = None
    sys.modules["torch_geometric"].utils = sys.modules["torch_geometric.utils"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    torch.manual_seed(0)
    from EGNO.model.basic import EGNN_Layer
    from EGNO.model.egno import EGNO as TorchEGNO
    from EGNO.model.layer_no import SpectralConv1d
    from SEGNO.models.model import SEGNO as TorchSEGNO
    return SimpleNamespace(torch=torch, EGNN_Layer=EGNN_Layer,
                           TorchEGNO=TorchEGNO, SpectralConv1d=SpectralConv1d,
                           TorchSEGNO=TorchSEGNO)


def sparse_edges(batch_size, n):
    """Reference edge list: i-major over ordered pairs i != j, batched with
    node offsets (dataset_simple.py:65-71, :101-111)."""
    rows, cols = [], []
    for b in range(batch_size):
        for i in range(n):
            for j in range(n):
                if i != j:
                    rows.append(b * n + i)
                    cols.append(b * n + j)
    return np.asarray(rows), np.asarray(cols)


def dense_to_sparse_attr(dense):
    """[B, N, N, E] -> [B*M, E] in reference edge order."""
    b, n = dense.shape[0], dense.shape[1]
    out = []
    for bb in range(b):
        for i in range(n):
            for j in range(n):
                if i != j:
                    out.append(dense[bb, i, j])
    return np.stack(out)


class TestEGNNLayerParity:
    @pytest.mark.parametrize("with_v", [True, False])
    def test_forward(self, ref, with_v):
        torch = ref.torch
        b, n, hd, e = 2, 4, 16, 2
        tl = ref.EGNN_Layer(in_edge_nf=e, hidden_nf=hd, with_v=with_v)
        layer = EGNNLayer(hidden_nf=hd, in_edge_nf=e, with_v=with_v)
        p = jax.tree.map(lambda x: x, {
            "edge_net": None, "coord_net": None})  # replaced below
        sd = tl.state_dict()
        from nonode_tpu.compat.torch_port import _mlp
        p = {"edge_net": _mlp(sd, "edge_message_net.scalar_net.mlp"),
             "coord_net": _mlp(sd, "coord_net.mlp"),
             "node_net": _mlp(sd, "node_net.mlp")}
        if with_v:
            p["node_v_net"] = _mlp(sd, "node_v_net.mlp")

        rng = np.random.RandomState(0)
        x = rng.randn(b, n, 3).astype(np.float32)
        h = rng.randn(b, n, hd).astype(np.float32)
        ef = rng.randn(b, n, n, e).astype(np.float32)
        v = rng.randn(b, n, 3).astype(np.float32)

        rows, cols = sparse_edges(b, n)
        with torch.no_grad():
            xt, vt, ht = tl(torch.tensor(x.reshape(-1, 3)),
                            torch.tensor(h.reshape(-1, hd)),
                            [torch.tensor(rows), torch.tensor(cols)],
                            torch.tensor(dense_to_sparse_attr(ef)),
                            v=torch.tensor(v.reshape(-1, 3)) if with_v else None)
        xj, vj, hj = layer(p, jnp.asarray(x), jnp.asarray(h), jnp.asarray(ef),
                           v=jnp.asarray(v) if with_v else None)
        np.testing.assert_allclose(np.asarray(xj).reshape(-1, 3),
                                   xt.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hj).reshape(-1, hd),
                                   ht.numpy(), rtol=1e-4, atol=1e-5)
        if with_v:
            np.testing.assert_allclose(np.asarray(vj).reshape(-1, 3),
                                       vt.numpy(), rtol=1e-4, atol=1e-5)


class TestSpectralParity:
    def test_spectral_conv1d(self, ref):
        torch = ref.torch
        t, n, c, modes = 10, 6, 8, 3
        tc = ref.SpectralConv1d(c, c, modes)
        conv = SpectralConv(c, c, modes)
        p = {"w": jnp.asarray(tc.weights1.detach().numpy())}
        rng = np.random.RandomState(1)
        x = rng.randn(t, n, c).astype(np.float32)
        with torch.no_grad():
            want = tc(torch.tensor(x)).numpy()
        got = np.asarray(conv(p, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _egno_inputs(b, n, num_inputs=1, seed=0):
    rng = np.random.RandomState(seed)
    shape = (num_inputs, b, n) if num_inputs > 1 else (b, n)
    loc = rng.randn(*shape, 3).astype(np.float32)
    vel = rng.randn(*shape, 3).astype(np.float32)
    charges = rng.choice([-1.0, 1.0], size=(b, n, 1)).astype(np.float32)
    speed = np.linalg.norm(vel, axis=-1, keepdims=True)
    if num_inputs > 1:
        nodes = np.concatenate(
            [speed, np.broadcast_to(charges, (num_inputs, b, n, 1))], -1)
    else:
        nodes = np.concatenate([speed, charges], -1)
    w = np.einsum("bik,bjk->bij", charges, charges)[..., None]
    d = loc[..., :, None, :] - loc[..., None, :, :]
    dist = (d * d).sum(-1, keepdims=True)
    if num_inputs > 1:
        wb = np.broadcast_to(w, (num_inputs, b, n, n, 1))
        edge_attr = np.concatenate([wb, dist], -1).astype(np.float32)
    else:
        edge_attr = np.concatenate([w, dist], -1).astype(np.float32)
    loc_mean = loc.mean(-2, keepdims=True).repeat(n, -2).astype(np.float32)
    return loc, vel, nodes, edge_attr, loc_mean


class TestEGNOParity:
    @pytest.mark.parametrize("t,num_modes", [(10, 2), (5, 5), (8, 3)])
    def test_single_input(self, ref, t, num_modes):
        torch = ref.torch
        b, n, hd = 3, 5, 32
        tm = ref.TorchEGNO(n_layers=3, in_node_nf=2, in_edge_nf=2, hidden_nf=hd,
                           with_v=True, num_modes=num_modes, num_timesteps=t,
                           time_emb_dim=16, num_inputs=1)
        model = EGNO(n_layers=3, in_node_nf=2, in_edge_nf=2, hidden_nf=hd,
                     num_modes=num_modes, num_timesteps=t, time_emb_dim=16,
                     num_inputs=1)
        p = egno_params_from_state_dict(tm.state_dict(), n_layers=3)

        loc, vel, nodes, edge_attr, loc_mean = _egno_inputs(b, n)
        t_out = np.broadcast_to(np.arange(1, t + 1, dtype=np.float32), (b, t))

        rows, cols = sparse_edges(b, n)
        with torch.no_grad():
            xt, vt, ht = tm(torch.tensor(loc.reshape(-1, 3)),
                            torch.tensor(nodes.reshape(-1, 2)),
                            [torch.tensor(rows), torch.tensor(cols)],
                            torch.tensor(dense_to_sparse_attr(edge_attr)),
                            v=torch.tensor(vel.reshape(-1, 3)),
                            loc_mean=torch.tensor(loc_mean.reshape(-1, 3)),
                            timesteps_out=torch.tensor(np.ascontiguousarray(t_out)))
        xj, vj, hj = model(p, jnp.asarray(loc), jnp.asarray(vel),
                           jnp.asarray(nodes), jnp.asarray(edge_attr),
                           jnp.asarray(loc_mean),
                           timesteps_out=jnp.asarray(t_out))
        np.testing.assert_allclose(np.asarray(xj).reshape(-1, 3), xt.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(vj).reshape(-1, 3), vt.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(hj).reshape(-1, hd), ht.numpy(),
                                   rtol=2e-3, atol=2e-3)

    def test_state_dict_round_trip(self, ref):
        """egno_state_dict_from_params is an exact inverse of
        egno_params_from_state_dict, and its key set strict-loads into the
        reference torch model — the contract the cross-framework rollout
        transplant (scripts/rollout_transplant.py direction B) relies on."""
        torch = ref.torch
        from nonode_tpu.compat import egno_state_dict_from_params
        tm = ref.TorchEGNO(n_layers=3, in_node_nf=2, in_edge_nf=2,
                           hidden_nf=32, with_v=True, num_modes=2,
                           num_timesteps=10, time_emb_dim=16, num_inputs=1)
        sd = tm.state_dict()
        params = egno_params_from_state_dict(sd, n_layers=3)
        sd2 = {k: torch.tensor(v)
               for k, v in egno_state_dict_from_params(params, 3).items()}
        assert set(sd2) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(sd2[k].numpy(), sd[k].numpy())
        tm.load_state_dict(sd2, strict=True)

    def test_multi_input(self, ref):
        torch = ref.torch
        b, n, hd, t, L = 2, 4, 32, 10, 2
        tm = ref.TorchEGNO(n_layers=2, in_node_nf=2, in_edge_nf=2, hidden_nf=hd,
                           with_v=True, num_modes=2, num_timesteps=t,
                           time_emb_dim=16, num_inputs=L)
        model = EGNO(n_layers=2, in_node_nf=2, in_edge_nf=2, hidden_nf=hd,
                     num_modes=2, num_timesteps=t, time_emb_dim=16, num_inputs=L)
        p = egno_params_from_state_dict(tm.state_dict(), n_layers=2)

        loc, vel, nodes, edge_attr, loc_mean = _egno_inputs(b, n, num_inputs=L)
        t_out = np.broadcast_to(np.arange(1, t + 1, dtype=np.float32), (b, t))
        t_in = np.broadcast_to(np.asarray([-1.0, 0.0], np.float32), (b, L))

        rows, cols = sparse_edges(b, n)
        sp_attr = np.stack([dense_to_sparse_attr(edge_attr[i]) for i in range(L)])
        with torch.no_grad():
            xt, vt, ht = tm(torch.tensor(loc.reshape(L, -1, 3)),
                            torch.tensor(nodes.reshape(L, -1, 2)),
                            [torch.tensor(rows), torch.tensor(cols)],
                            torch.tensor(sp_attr),
                            v=torch.tensor(vel.reshape(L, -1, 3)),
                            loc_mean=torch.tensor(loc_mean.reshape(L, -1, 3)),
                            timesteps_in=torch.tensor(np.ascontiguousarray(t_in)),
                            timesteps_out=torch.tensor(np.ascontiguousarray(t_out)))
        xj, vj, hj = model(p, jnp.asarray(loc), jnp.asarray(vel),
                           jnp.asarray(nodes), jnp.asarray(edge_attr),
                           jnp.asarray(loc_mean),
                           timesteps_out=jnp.asarray(t_out),
                           timesteps_in=jnp.asarray(t_in))
        np.testing.assert_allclose(np.asarray(xj).reshape(-1, 3), xt.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(vj).reshape(-1, 3), vt.numpy(),
                                   rtol=2e-4, atol=2e-4)


class TestEGNORolloutParity:
    def test_rollout_loop_matches_reference_semantics(self, ref):
        """The full autoregressive rollout (window decode -> feedback frame
        selection -> feature recomputation) must match the reference's
        rollout_fn step for step (main_simulation_simple_no.py:342-384)."""
        import jax as _jax
        torch = ref.torch
        from nonode_tpu.train.loop import EGNOExperiment

        b, n, hd, t, traj_len = 2, 5, 32, 5, 3
        tm = ref.TorchEGNO(n_layers=2, in_node_nf=2, in_edge_nf=2,
                           hidden_nf=hd, with_v=True, num_modes=2,
                           num_timesteps=t, time_emb_dim=16, num_inputs=1)
        model = EGNO(n_layers=2, in_node_nf=2, in_edge_nf=2, hidden_nf=hd,
                     num_modes=2, num_timesteps=t, time_emb_dim=16)
        p = egno_params_from_state_dict(tm.state_dict(), n_layers=2)
        exp = EGNOExperiment(model)

        loc, vel, nodes, edge_attr, loc_mean = _egno_inputs(b, n)
        charges = nodes[..., 1:2]
        w = edge_attr[..., 0:1]
        t_out_all = np.broadcast_to(
            np.arange(1, t * traj_len + 1, dtype=np.float32),
            (b, t * traj_len)).copy()
        t_in = np.zeros((b, 1), np.float32)

        rows, cols = sparse_edges(b, n)
        edges_t = [torch.tensor(rows), torch.tensor(cols)]
        ea_o = torch.tensor(dense_to_sparse_attr(w))

        def prep(loc_t, vel_t):
            lm = loc_t.view(b, n, 3).mean(1, keepdim=True).repeat(1, n, 1).view(-1, 3)
            nd = torch.cat([torch.sqrt((vel_t ** 2).sum(1)).unsqueeze(1),
                            torch.tensor(charges.reshape(-1, 1))], dim=1)
            ld = ((loc_t[rows] - loc_t[cols]) ** 2).sum(1).unsqueeze(1)
            return nd, torch.cat([ea_o, ld], 1), lm

        loc_t = torch.tensor(loc.reshape(-1, 3))
        vel_t = torch.tensor(vel.reshape(-1, 3))
        preds_t = []
        with torch.no_grad():
            nd, ea, lm = prep(loc_t, vel_t)
            for i in range(traj_len):
                t_out = torch.tensor(t_out_all[:, i * t:(i + 1) * t] - i * t)
                x, v, _ = tm(loc_t, nd, edges_t, ea, v=vel_t, loc_mean=lm,
                             timesteps_out=t_out)
                preds_t.append(x.view(t, b, n, 3).numpy())
                loc_t = x.view(t, -1, 3)[-1]
                vel_t = v.view(t, -1, 3)[-1]
                nd, ea, lm = prep(loc_t, vel_t)
        preds_t = np.concatenate(preds_t, 0)

        batch = (jnp.asarray(loc)[:, None], jnp.asarray(vel)[:, None],
                 jnp.asarray(charges), jnp.asarray(w), None,
                 jnp.asarray(t_in), jnp.asarray(t_out_all))
        locs_pred, _ = exp.rollout(p, batch, traj_len, "charged")
        np.testing.assert_allclose(np.asarray(locs_pred), preds_t,
                                   rtol=2e-4, atol=2e-4)


class TestSEGNOParity:
    """The reference's live forward (model.py:53) has a regression: the last
    segment's integration result is never assigned back, so single-input
    returns its inputs unchanged. Parity is therefore checked against the
    intended semantics (embedding + forward_step, which the dead first
    forward also implements); the regression itself is pinned below."""

    def test_reference_live_forward_is_identity(self, ref):
        """Pin the reference bug so the documented divergence stays honest."""
        torch = ref.torch
        b, n, hd = 2, 4, 16
        tm = ref.TorchSEGNO(in_node_nf=1, in_edge_nf=2, hidden_nf=hd,
                            n_layers=8, recurrent=True, act_fn=torch.nn.SiLU())
        rng = np.random.RandomState(0)
        x = torch.tensor(rng.randn(b * n, 3).astype(np.float32))
        v = torch.tensor(rng.randn(b * n, 3).astype(np.float32))
        his = torch.linalg.norm(v, axis=-1, keepdims=True)
        rows, cols = sparse_edges(b, n)
        ea = torch.tensor(rng.randn(len(rows), 2).astype(np.float32))
        with torch.no_grad():
            xt, _, vt = tm(his, x, [torch.tensor(rows), torch.tensor(cols)],
                           v, ea, T=10)
        assert torch.equal(xt, x) and torch.equal(vt, v)

    def test_single_input(self, ref):
        torch = ref.torch
        b, n, hd, t = 3, 5, 32, 7
        tm = ref.TorchSEGNO(in_node_nf=1, in_edge_nf=2, hidden_nf=hd,
                            n_layers=8, recurrent=True, act_fn=torch.nn.SiLU())
        model = SEGNO(in_node_nf=1, in_edge_nf=2, hidden_nf=hd, n_layers=8)
        p = segno_params_from_state_dict(tm.state_dict())

        rng = np.random.RandomState(2)
        x = rng.randn(b, n, 3).astype(np.float32)
        v = rng.randn(b, n, 3).astype(np.float32)
        his = np.linalg.norm(v, axis=-1, keepdims=True).astype(np.float32)
        q = rng.choice([-1.0, 1.0], size=(b, n, 1)).astype(np.float32)
        w = np.einsum("bik,bjk->bij", q, q)[..., None]
        d = x[:, :, None] - x[:, None, :]
        edge_attr = np.concatenate([w, (d * d).sum(-1, keepdims=True)],
                                   -1).astype(np.float32)

        rows, cols = sparse_edges(b, n)
        with torch.no_grad():
            # intended reference semantics: embed, then forward_step(T)
            h0 = tm.embedding(torch.tensor(his.reshape(-1, 1)))
            xt, ht, vt = tm.forward_step(
                h0, torch.tensor(x.reshape(-1, 3)),
                [torch.tensor(rows), torch.tensor(cols)],
                torch.tensor(v.reshape(-1, 3)),
                torch.tensor(dense_to_sparse_attr(edge_attr)), T=t)
        xj, hj, vj = model(p, jnp.asarray(his), jnp.asarray(x), jnp.asarray(v),
                           jnp.asarray(edge_attr), T=t)
        np.testing.assert_allclose(np.asarray(xj).reshape(-1, 3), xt.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(vj).reshape(-1, 3), vt.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(hj).reshape(-1, hd), ht.numpy(),
                                   rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("num_prev", [1, 2])
    def test_rollout_loop_matches_reference(self, ref, num_prev):
        """Step-for-step autoregressive rollout parity against the
        reference's ACTUAL rollout_fn (SEGNO/train_nbody.py:200-236),
        including the sliding multi-input window (:220-226). The reference
        model runs under the intended-semantics patch (its live forward is
        untrainable/identity — pinned above); the patch is reverted after."""
        torch = ref.torch
        from nonode_tpu.compat.ref_runner import (
            install_segno_intended_semantics)
        from nonode_tpu.train.loop import SEGNOExperiment
        import SEGNO.models.model as segmod
        from SEGNO.train_nbody import rollout_fn

        b, n, hd, t, traj_len, L = 2, 5, 32, 5, 3, num_prev
        agg = "attn" if L > 1 else None
        tm = ref.TorchSEGNO(in_node_nf=1, in_edge_nf=2, hidden_nf=hd,
                            n_layers=8, recurrent=True,
                            act_fn=torch.nn.SiLU(), multiple_agg=agg)
        model = SEGNO(in_node_nf=1, in_edge_nf=2, hidden_nf=hd, n_layers=8,
                      multiple_agg=agg)
        p = segno_params_from_state_dict(tm.state_dict())
        exp = SEGNOExperiment(model, num_timesteps=t)

        rng = np.random.RandomState(5)
        x = rng.randn(L, b, n, 3).astype(np.float32)
        v = rng.randn(L, b, n, 3).astype(np.float32)
        q = rng.choice([-1.0, 1.0], size=(b, n, 1)).astype(np.float32)
        w = np.einsum("bik,bjk->bij", q, q)[..., None].astype(np.float32)
        in_steps = None if L == 1 else (-2, 0)

        rows, cols = sparse_edges(b, n)
        edges_t = [torch.tensor(rows), torch.tensor(cols)]
        q_t = torch.tensor(q.reshape(-1, 1))
        if L == 1:
            loc_t = torch.tensor(x[0].reshape(-1, 3))
            vel_t = torch.tensor(v[0].reshape(-1, 3))
            h_t = torch.sqrt((vel_t ** 2).sum(1)).unsqueeze(1)
            ld = ((loc_t[rows] - loc_t[cols]) ** 2).sum(1).unsqueeze(1)
            ins_t = None
        else:
            loc_t = torch.tensor(x.transpose(1, 2, 0, 3).reshape(-1, L, 3))
            vel_t = torch.tensor(v.transpose(1, 2, 0, 3).reshape(-1, L, 3))
            h_t = torch.sqrt((vel_t ** 2).sum(-1)).unsqueeze(-1)
            ld = ((loc_t[rows, -1] - loc_t[cols, -1]) ** 2).sum(1).unsqueeze(1)
            ins_t = torch.tensor(list(in_steps)).int()
        ea_t = torch.cat([q_t[rows] * q_t[cols], ld], 1)

        old_forward = segmod.SEGNO.forward
        install_segno_intended_semantics()
        try:
            with torch.no_grad():
                preds_t, _ = rollout_fn(
                    tm, h_t, loc_t, edges_t, vel_t, ea_t, batch=None,
                    traj_len=traj_len, num_steps=[t] * traj_len,
                    num_prev=L, charges=q_t, energy_fun=None, in_steps=ins_t)
        finally:
            segmod.SEGNO.forward = old_forward
            segmod.SEGNO._nonode_intended = False

        batch = (jnp.asarray(x[0] if L == 1 else x),
                 jnp.asarray(v[0] if L == 1 else v),
                 jnp.asarray(q), jnp.asarray(w), None)
        locs_pred, _ = exp.rollout(p, batch, traj_len, in_steps, "charged")
        np.testing.assert_allclose(
            np.asarray(locs_pred).reshape(traj_len, -1, 3), preds_t.numpy(),
            rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("agg", ["sum", "attn"])
    def test_multi_input(self, ref, agg):
        torch = ref.torch
        b, n, hd, t, L = 2, 4, 32, 5, 2
        tm = ref.TorchSEGNO(in_node_nf=1, in_edge_nf=2, hidden_nf=hd,
                            n_layers=8, recurrent=True, act_fn=torch.nn.SiLU(),
                            multiple_agg=agg)
        model = SEGNO(in_node_nf=1, in_edge_nf=2, hidden_nf=hd, n_layers=8,
                      multiple_agg=agg)
        p = segno_params_from_state_dict(tm.state_dict())

        rng = np.random.RandomState(3)
        x = rng.randn(L, b, n, 3).astype(np.float32)
        v = rng.randn(L, b, n, 3).astype(np.float32)
        his = np.linalg.norm(v, axis=-1, keepdims=True).astype(np.float32)
        q = rng.choice([-1.0, 1.0], size=(b, n, 1)).astype(np.float32)
        w = np.einsum("bik,bjk->bij", q, q)[..., None]
        d = x[-1][:, :, None] - x[-1][:, None, :]
        edge_attr = np.concatenate([w, (d * d).sum(-1, keepdims=True)],
                                   -1).astype(np.float32)
        in_steps = (0, 3)

        rows, cols = sparse_edges(b, n)
        # torch layout: [BN, L, .]
        xt_in = torch.tensor(x.transpose(1, 2, 0, 3).reshape(-1, L, 3))
        vt_in = torch.tensor(v.transpose(1, 2, 0, 3).reshape(-1, L, 3))
        ht_in = torch.tensor(his.transpose(1, 2, 0, 3).reshape(-1, L, 1))
        edges_t = [torch.tensor(rows), torch.tensor(cols)]
        ea_t = torch.tensor(dense_to_sparse_attr(edge_attr))
        steps = [in_steps[1] - in_steps[0], t]
        with torch.no_grad():
            # intended reference semantics: per-segment forward_step + fusion,
            # INCLUDING the final integration the live forward drops.
            h_all = tm.embedding(ht_in)
            h_, x_, v_ = h_all[:, 0], xt_in[:, 0], vt_in[:, 0]
            for i, step in enumerate(steps):
                xi, hi, vi = tm.forward_step(h_, x_, edges_t, v_, ea_t, T=step)
                if i < len(steps) - 1:
                    if agg == "sum":
                        h_ = h_all[:, i + 1] + hi
                        x_ = xt_in[:, i + 1] + xi
                        v_ = vt_in[:, i + 1] + vi
                    else:
                        hs = torch.stack([h_all[:, i + 1], hi], dim=1)
                        xs = torch.stack([xt_in[:, i + 1], xi], dim=1)
                        vs = torch.stack([vt_in[:, i + 1], vi], dim=1)
                        x_, v_, h_ = tm.prepare_node_inputs(xs, vs, hs)
                else:
                    x_, h_, v_ = xi, hi, vi
            xt, ht, vt = x_, h_, v_
        xj, hj, vj = model(p, jnp.asarray(his), jnp.asarray(x), jnp.asarray(v),
                           jnp.asarray(edge_attr), T=t, in_steps=in_steps)
        np.testing.assert_allclose(np.asarray(xj).reshape(-1, 3), xt.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(vj).reshape(-1, 3), vt.numpy(),
                                   rtol=2e-4, atol=2e-4)


class TestRFVelParity:
    def test_forward(self, ref):
        """RFVel vs reference RF_vel (basic.py:288-339) with ported weights.
        RF_vel's default act_fn=nn.SiLU() overrides GCL_rf_vel's LeakyReLU
        default and is used in BOTH phi and coord_mlp_vel."""
        from EGNO.model.basic import RF_vel

        from nonode_tpu.models.baselines import RFVel

        torch = ref.torch
        torch.manual_seed(3)
        b, n, nf = 2, 4, 16
        tm = RF_vel(hidden_nf=nf, edge_attr_nf=1, n_layers=2)

        layers = []
        for i in range(2):
            gcl = tm._modules[f"gcl_{i}"]
            g = lambda t: t.detach().numpy()
            layers.append({
                "phi_l1": {"w": g(gcl.phi[0].weight), "b": g(gcl.phi[0].bias)},
                "phi_l2": {"w": g(gcl.phi[2].weight)},
                "vel_mlp": {
                    "l1": {"w": g(gcl.coord_mlp_vel[0].weight),
                           "b": g(gcl.coord_mlp_vel[0].bias)},
                    "l2": {"w": g(gcl.coord_mlp_vel[2].weight),
                           "b": g(gcl.coord_mlp_vel[2].bias)},
                },
            })
        p = {"layers": [jax.tree.map(jnp.asarray, lp) for lp in layers]}
        model = RFVel(hidden_nf=nf, edge_attr_nf=1, n_layers=2)

        rng = np.random.RandomState(0)
        x = rng.randn(b, n, 3).astype(np.float32)
        vel = rng.randn(b, n, 3).astype(np.float32)
        vel_norm = np.linalg.norm(vel, axis=-1, keepdims=True).astype(np.float32)
        ea_dense = rng.randn(b, n, n, 1).astype(np.float32)

        rows, cols = sparse_edges(b, n)
        with torch.no_grad():
            xt = tm(torch.tensor(vel_norm.reshape(-1, 1)),
                    torch.tensor(x.reshape(-1, 3)),
                    [torch.tensor(rows), torch.tensor(cols)],
                    torch.tensor(vel.reshape(-1, 3)),
                    torch.tensor(dense_to_sparse_attr(ea_dense)))
        xj = model(p, jnp.asarray(vel_norm), jnp.asarray(x), jnp.asarray(vel),
                   jnp.asarray(ea_dense))
        np.testing.assert_allclose(np.asarray(xj).reshape(-1, 3), xt.numpy(),
                                   rtol=2e-5, atol=2e-5)


class TestEGNORolloutRealReference:
    def test_rollout_matches_actual_reference_rollout_fn(self, ref):
        """Invoke the reference's OWN rollout_fn + prepare_inputs
        (main_simulation_simple_no.py:311-384, imported with the
        random_ascending_tensor shim) rather than a transcription of them —
        a transcription error could let both sides agree while diverging
        from the real reference."""
        import importlib

        torch = ref.torch
        from nonode_tpu.train.loop import EGNOExperiment

        eg_utils = importlib.import_module("EGNO.utils")
        if not hasattr(eg_utils, "random_ascending_tensor"):
            root_utils = importlib.import_module("utils")
            eg_utils.random_ascending_tensor = root_utils.random_ascending_tensor
        rm = importlib.import_module("EGNO.main_simulation_simple_no")

        b, n, hd, t, traj_len = 2, 5, 32, 5, 3
        torch.manual_seed(5)
        tm = ref.TorchEGNO(n_layers=2, in_node_nf=2, in_edge_nf=2,
                           hidden_nf=hd, with_v=True, num_modes=2,
                           num_timesteps=t, time_emb_dim=16, num_inputs=1)
        model = EGNO(n_layers=2, in_node_nf=2, in_edge_nf=2, hidden_nf=hd,
                     num_modes=2, num_timesteps=t, time_emb_dim=16)
        p = egno_params_from_state_dict(tm.state_dict(), n_layers=2)
        exp = EGNOExperiment(model)

        rng = np.random.RandomState(11)
        loc = rng.randn(b, n, 3).astype(np.float32)
        vel = rng.randn(b, n, 3).astype(np.float32)
        charges = rng.choice([-1.0, 1.0], (b, n, 1)).astype(np.float32)
        w = np.einsum("bik,bjk->bij", charges, charges)[..., None] \
            .astype(np.float32)
        t_out_all = np.broadcast_to(
            np.arange(1, t * traj_len + 1, dtype=np.float32),
            (b, t * traj_len)).copy()

        rows, cols = sparse_edges(b, n)
        edges_t = [torch.tensor(rows), torch.tensor(cols)]
        ea_o = torch.tensor(dense_to_sparse_attr(w))
        charges_t = torch.tensor(charges)
        with torch.no_grad():
            l0, v0, ea, nd, lm = rm.prepare_inputs(
                torch.tensor(loc), torch.tensor(vel), ea_o, edges_t, n, 1,
                charges_t)
            loc_preds, _, _ = rm.rollout_fn(
                tm, nd, l0, edges_t, v0, ea_o, ea, lm, n, traj_len, b,
                charges=charges_t, num_steps=t,
                timesteps_in=torch.zeros((b, 1), dtype=torch.long),
                timesteps_out=torch.tensor(t_out_all))
        preds_ref = loc_preds.numpy().reshape(traj_len * t, b, n, 3)

        batch = (jnp.asarray(loc)[:, None], jnp.asarray(vel)[:, None],
                 jnp.asarray(charges), jnp.asarray(w), None,
                 jnp.zeros((b, 1), jnp.float32), jnp.asarray(t_out_all))
        locs_pred, _ = exp.rollout(p, batch, traj_len, "charged")
        np.testing.assert_allclose(np.asarray(locs_pred), preds_ref,
                                   rtol=2e-4, atol=2e-4)
