"""Dense pairwise graph ops — the TPU-native formulation of the reference's
sparse edge-list message passing.

The reference (EGNO/model/basic.py:6-31, SEGNO/models/models/gcl.py:7-23)
builds an explicit O(N^2) edge list over the complete graph and uses
scatter_add / dense one-hot matmuls to aggregate. On TPU, for the fully
connected graphs used throughout (N <= 20 in the standard configs), the
idiomatic equivalent is dense ``[..., N, N, .]`` tensors with an off-diagonal
mask:

- ``aggregate(aggr='mean')`` with every edge present == masked mean over the
  j axis with count N-1 (the reference clamps count at 1; identical here).
- ``aggregate(aggr='sum')`` / ``unsorted_segment_sum`` == masked sum over j.
- ``unsorted_segment_mean``'s row-normalized one-hot matmul
  (SEGNO/models/models/gcl.py:16-23) == the same masked mean.

Edge (i, j) carries the message received by node i from node j, matching the
reference's row=receiver convention (EGNO/model/basic.py:174,182).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import MLP, Linear, Params, xavier_uniform_init


def offdiag_mask(n: int, dtype=jnp.float32):
    """[N, N] mask that zeroes self-edges (the diagonal)."""
    return 1.0 - jnp.eye(n, dtype=dtype)


def pairwise_diff(x):
    """x: [..., N, D] -> r[..., i, j, :] = x_i - x_j."""
    return x[..., :, None, :] - x[..., None, :, :]


def masked_sum_j(m, mask):
    """m: [..., N, N, K]; mask: [..., N, N]. Sum over j with masked edges
    zeroed."""
    return (m * mask[..., None]).sum(axis=-2)


def masked_mean_j(m, mask):
    """Mean over unmasked j; the divisor is the per-node degree clamped at 1,
    matching the reference's count.clamp(min=1) (basic.py:23-28). For the
    complete graph (mask = offdiag) the degree is N-1 everywhere."""
    degree = mask.sum(axis=-1)[..., None]           # [..., N, 1]
    return masked_sum_j(m, mask) / jnp.maximum(degree, 1.0)


def _l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2): x / max(||x||, eps)."""
    norm = jnp.sqrt((x * x).sum(axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def first_edge_linear(p, segments):
    """First Linear of an edge MLP over ``concat(segments)`` without ever
    materializing the wide ``[..., N, N, sum(k)]`` concat.

    ``segments`` are ordered ``(array, kind)`` pairs matching the concat
    layout the weights were initialized for: kind 'pair' is a pairwise
    feature ``[..., N, N, k]``; 'i' / 'j' are node features ``[..., N, k]``
    broadcast over the sender / receiver axis. A matmul over a concat equals
    the sum of per-slice matmuls, so this is exact up to fp32 summation
    order — but node slices now cost O(N) row-matmuls instead of O(N^2), and
    the dominant HBM write of the hot EGNN forward (the reference gathers
    h[row], h[col] per edge, EGNO/model/basic.py:160-169; the round-1 dense
    port broadcast them into a [..., N, N, 1+2H+E] concat) disappears.
    """
    w = p["w"]
    dtypes = {arr.dtype for arr, _ in segments}
    assert len(dtypes) == 1, (
        f"first_edge_linear segments mix dtypes {sorted(map(str, dtypes))}; "
        "precision is chosen once from the first segment, so a mixed call "
        "would silently change numerics — cast inputs to a common dtype")
    prec = (None if segments[0][0].dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    off = 0
    acc = {"pair": None, "i": None, "j": None}
    for arr, kind in segments:
        k = arr.shape[-1]
        y = jnp.matmul(arr, w[:, off:off + k].T, precision=prec)
        acc[kind] = y if acc[kind] is None else acc[kind] + y
        off += k
    assert off == w.shape[1], (off, w.shape)
    out = acc["pair"]
    if acc["i"] is not None:
        out = out + acc["i"][..., :, None, :]
    if acc["j"] is not None:
        out = out + acc["j"][..., None, :, :]
    return out + p["b"]


@dataclasses.dataclass(frozen=True)
class EGNNLayer:
    """Dense EGNN layer.

    Mirrors EGNN_Layer (EGNO/model/basic.py:147-186): edge message from an
    InvariantScalarNet over [||r_ij||^2 (the 1-vector Gram matrix), h_i, h_j,
    edge_fea]; per-edge scalar coordinate weight; mean-aggregated force
    clamped to +-100; optional velocity gate ``x += node_v_net(h) * v``;
    node update from [h, sum_j message].
    """

    hidden_nf: int
    in_edge_nf: int
    act: callable = jax.nn.silu
    with_v: bool = False
    flat: bool = False
    norm: bool = False
    h_update: bool = True
    fused: bool = False  # route the pairwise chain through the Pallas
    #                      fused kernel (ops/pallas/egnn_fused.py) when the
    #                      config is supported; falls back to dense XLA

    @property
    def edge_net(self) -> MLP:
        # InvariantScalarNet(n_vector_input=1, n_scalar_input=2H+E):
        # input = 1*1 Gram scalar + scalars (basic.py:107-144).
        return MLP(1 + 2 * self.hidden_nf + self.in_edge_nf, self.hidden_nf,
                   self.hidden_nf, self.act, last_act=True, flat=self.flat)

    @property
    def coord_net(self) -> MLP:
        return MLP(self.hidden_nf, self.hidden_nf, 1, self.act, flat=self.flat)

    @property
    def node_v_net(self) -> MLP:
        return MLP(self.hidden_nf, self.hidden_nf, 1, self.act, flat=self.flat)

    @property
    def node_net(self) -> MLP:
        return MLP(2 * self.hidden_nf, self.hidden_nf, self.hidden_nf,
                   self.act, flat=self.flat)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        p = {
            "edge_net": self.edge_net.init(ks[0]),
            "coord_net": self.coord_net.init(ks[1]),
        }
        if self.with_v:
            p["node_v_net"] = self.node_v_net.init(ks[2])
        if self.h_update:
            p["node_net"] = self.node_net.init(ks[3])
        return p

    def _use_fused(self, x, edge_mask) -> bool:
        from .pallas.egnn_fused import supported
        return (self.fused and self.in_edge_nf >= 1
                and (edge_mask is None or edge_mask.ndim == 2)
                and supported(x.shape[-2], self.hidden_nf, x.dtype,
                              self.act, self.flat, self.norm))

    def _fused_pairwise(self, p, x, h, edge_fea, mask):
        """Pairwise chain via the Pallas fused kernel. Leading batch dims
        are flattened to one graph axis; the h_i/h_j column slices of the
        first edge-MLP Linear are projected node-level here (the same
        decomposition as first_edge_linear), so the kernel only sees
        [G, N, .] node tensors plus the [G, N, N, E] edge features."""
        from .pallas.egnn_fused import pairwise_message
        hdim, e = self.hidden_nf, self.in_edge_nf
        lead = x.shape[:-2]
        n = x.shape[-2]
        g = int(np.prod(lead)) if lead else 1

        l1, l2 = p["edge_net"]["l1"], p["edge_net"]["l2"]
        c1, c2 = p["coord_net"]["l1"], p["coord_net"]["l2"]
        w1 = l1["w"]                                    # [H, 1+2H+E]
        wi, wj = w1[:, 1:1 + hdim], w1[:, 1 + hdim:1 + 2 * hdim]
        prec = jax.lax.Precision.HIGHEST
        hi = jnp.matmul(h, wi.T, precision=prec)
        hj = jnp.matmul(h, wj.T, precision=prec)
        weights = (w1[:, :1].T, w1[:, 1 + 2 * hdim:].T, l1["b"][None, :],
                   l2["w"].T, l2["b"][None, :],
                   c1["w"].T, c1["b"][None, :],
                   c2["w"].T, c2["b"][None, :])        # wc2 [H,1], bc2 [1,1]
        ef = jnp.broadcast_to(edge_fea, (*lead, n, n, e))
        tot_f, tot_m = pairwise_message(
            False,
            x.reshape(g, n, 3), hi.reshape(g, n, hdim),
            hj.reshape(g, n, hdim), ef.reshape(g, n, n, e), mask, weights)
        return (tot_f.reshape(*lead, n, 3), tot_m.reshape(*lead, n, hdim))

    def __call__(self, p: Params, x, h, edge_fea, v=None, edge_mask=None):
        """x: [..., N, 3]; h: [..., N, H]; edge_fea: [..., N, N, E].

        edge_mask: optional [..., N, N] 0/1 mask restricting the graph (e.g.
        skeleton + 2-hop edges for mocap); defaults to the complete graph."""
        n = x.shape[-2]
        mask = offdiag_mask(n, x.dtype)
        if edge_mask is not None:
            mask = mask * edge_mask

        if self._use_fused(x, edge_mask):
            tot_f, tot_message = self._fused_pairwise(p, x, h, edge_fea, mask)
        else:
            rij = pairwise_diff(x)                            # [..., N, N, 3]
            r2 = (rij * rij).sum(axis=-1, keepdims=True)      # [..., N, N, 1]
            gram = _l2_normalize(r2) if self.norm else r2
            # edge_net over concat([gram, h_i, h_j, edge_fea]) with the
            # concat never built (see first_edge_linear)
            pre = first_edge_linear(
                p["edge_net"]["l1"],
                [(gram, "pair"), (h, "i"), (h, "j"), (edge_fea, "pair")])
            message = self.edge_net.from_preact(p["edge_net"], pre)
            coord_w = self.coord_net(p["coord_net"], message)  # [.., N, N, 1]
            f = rij * coord_w
            tot_f = masked_mean_j(f, mask)                    # [..., N, 3]
            tot_message = masked_sum_j(message, mask)         # [..., N, H]
        tot_f = jnp.clip(tot_f, -100.0, 100.0)

        if v is not None:
            x = x + self.node_v_net(p["node_v_net"], h) * v + tot_f
        else:
            x = x + tot_f

        if self.h_update:
            h = self.node_net(p["node_net"],
                              jnp.concatenate([h, tot_message], axis=-1))
        return x, v, h


@dataclasses.dataclass(frozen=True)
class SEGNOGCL:
    """Dense second-order equivariant GCL.

    Mirrors SEGNO_GCL (SEGNO/models/models/gcl.py:26-119): edge MLP on
    [h_i, h_j, ||r_ij||^2, edge_attr]; coord MLP -> per-edge scalar * r_ij,
    clamped +-100, mean-aggregated; second-order update
    ``v += agg / n_steps; x += v / n_steps``; residual node MLP on
    [h, sum_j edge_feat].

    The live reference path (SEGNO/models/model.py:95-102) always sets
    n_layers := T before integrating, so the step factor is 1/T here and the
    integration loop lives in the model (lax.scan), not the layer.
    """

    hidden_nf: int
    in_edge_nf: int = 0
    act: callable = jax.nn.silu
    recurrent: bool = True
    coords_weight: float = 1.0
    tanh: bool = False
    fused: bool = False  # Pallas fused pairwise kernel (egnn_fused.py);
    #                      SEGNO clips per edge -> clip_edges=True

    @property
    def edge_mlp(self) -> MLP:
        # nn.Sequential(Linear, act, Linear, act) — both layers activated.
        return MLP(2 * self.hidden_nf + 1 + self.in_edge_nf, self.hidden_nf,
                   self.hidden_nf, self.act, last_act=True)

    @property
    def node_mlp(self) -> MLP:
        return MLP(2 * self.hidden_nf, self.hidden_nf, self.hidden_nf, self.act)

    @property
    def coord_mlp_l1(self) -> Linear:
        return Linear(self.hidden_nf, self.hidden_nf)

    @property
    def coord_mlp_l2(self) -> Linear:
        return Linear(self.hidden_nf, 1)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 5)
        l2 = self.coord_mlp_l2.init(ks[3])
        # reference: xavier_uniform_(gain=0.001) on the final coord layer
        # (gcl.py:50-51); bias keeps the default Linear init.
        l2["w"] = xavier_uniform_init(ks[4], (1, self.hidden_nf), gain=0.001)
        return {
            "edge_mlp": self.edge_mlp.init(ks[0]),
            "node_mlp": self.node_mlp.init(ks[1]),
            "coord_mlp_l1": self.coord_mlp_l1.init(ks[2]),
            "coord_mlp_l2": l2,
        }

    # NOT a parameter: the reference's `nn.Parameter(torch.ones(1))*3`
    # (gcl.py:59) is a plain product — the result is an unregistered
    # constant tensor, never in parameters()/state_dict and never trained.
    COORDS_RANGE = 3.0

    def _coord_mlp(self, p: Params, e):
        y = self.act(self.coord_mlp_l1(p["coord_mlp_l1"], e))
        y = self.coord_mlp_l2(p["coord_mlp_l2"], y)
        if self.tanh:
            y = jnp.tanh(y) * self.COORDS_RANGE
        return y

    def _use_fused(self, x, edge_attr, edge_mask) -> bool:
        from .pallas.egnn_fused import supported
        return (self.fused and self.in_edge_nf >= 1 and edge_attr is not None
                and (edge_mask is None or edge_mask.ndim == 2)
                and supported(x.shape[-2], self.hidden_nf, x.dtype,
                              self.act, False, False, tanh=self.tanh))

    def _fused_pairwise(self, p, x, h, edge_attr, mask):
        """(masked-mean of per-edge-clipped trans, masked-sum of edge_feat)
        via the Pallas fused kernel. Input order of the edge MLP concat is
        [h_i, h_j, radial, edge_attr] (gcl.py:74-83), so the Wi/Wj slices
        lead and the radial column sits at 2H."""
        from .pallas.egnn_fused import pairwise_message
        hdim, e = self.hidden_nf, self.in_edge_nf
        lead = x.shape[:-2]
        n = x.shape[-2]
        g = int(np.prod(lead)) if lead else 1

        l1, l2 = p["edge_mlp"]["l1"], p["edge_mlp"]["l2"]
        c1, c2 = p["coord_mlp_l1"], p["coord_mlp_l2"]
        w1 = l1["w"]                                    # [H, 2H+1+E]
        wi, wj = w1[:, :hdim], w1[:, hdim:2 * hdim]
        prec = jax.lax.Precision.HIGHEST
        hi = jnp.matmul(h, wi.T, precision=prec)
        hj = jnp.matmul(h, wj.T, precision=prec)
        weights = (w1[:, 2 * hdim:2 * hdim + 1].T,
                   w1[:, 2 * hdim + 1:].T, l1["b"][None, :],
                   l2["w"].T, l2["b"][None, :],
                   c1["w"].T, c1["b"][None, :],
                   c2["w"].T, c2["b"][None, :])
        ef = jnp.broadcast_to(edge_attr, (*lead, n, n, e))
        tot_f, tot_m = pairwise_message(
            True,
            x.reshape(g, n, 3), hi.reshape(g, n, hdim),
            hj.reshape(g, n, hdim), ef.reshape(g, n, n, e), mask, weights)
        return (tot_f.reshape(*lead, n, 3), tot_m.reshape(*lead, n, hdim))

    def __call__(self, p: Params, h, x, v, edge_attr, inv_steps: float,
                 edge_mask=None):
        """One integrator step. inv_steps = 1/T (reference 1/n_layers)."""
        n = x.shape[-2]
        mask = offdiag_mask(n, x.dtype)
        if edge_mask is not None:
            mask = mask * edge_mask

        if self._use_fused(x, edge_attr, edge_mask):
            tot_trans, msg = self._fused_pairwise(p, x, h, edge_attr, mask)
            agg = tot_trans * self.coords_weight
        else:
            rij = pairwise_diff(x)
            radial = (rij * rij).sum(axis=-1, keepdims=True)
            # edge_mlp over concat([h_i, h_j, radial, edge_attr]), concat-free
            segs = [(h, "i"), (h, "j"), (radial, "pair")]
            if edge_attr is not None and self.in_edge_nf:
                segs.append((edge_attr, "pair"))
            pre = first_edge_linear(p["edge_mlp"]["l1"], segs)
            edge_feat = self.edge_mlp.from_preact(p["edge_mlp"], pre)

            trans = rij * self._coord_mlp(p, edge_feat)
            trans = jnp.clip(trans, -100.0, 100.0)
            agg = masked_mean_j(trans, mask) * self.coords_weight
            msg = masked_sum_j(edge_feat, mask)

        v = v + agg * inv_steps
        x = x + v * inv_steps

        out = self.node_mlp(p["node_mlp"], jnp.concatenate([h, msg], axis=-1))
        h = h + out if self.recurrent else out
        return h, x, v
