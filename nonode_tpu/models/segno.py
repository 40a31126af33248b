"""SEGNO — Second-order Equivariant Graph Neural ODE, dense TPU formulation.

One shared SEGNO_GCL applied T times as a weight-tied second-order integrator
with step 1/T (forward_step sets n_layers := T, SEGNO/models/model.py:95-102,
so the configured n_layers only matters as a default). Multi-input snapshots
are integrated segment-by-segment and fused with the next observation by sum
or invariant temporal attention (model.py:78-91).

DOCUMENTED DIVERGENCE from the reference snapshot: the live reference forward
(model.py:53-92; the first definition at :28-51 is shadowed) has a regression
— the result of the *last* integration segment (``xi, hi, vi``) is only
assigned back inside the ``i < len(steps) - 1`` fusion branch, so the
single-input path returns its inputs unchanged (an identity model) and the
multi-input path drops the final T-step integration. That cannot be the
intended semantics (it makes the model untrainable); the dead first forward
and ``forward_step`` define the intended behavior, which is what this class
implements: integrate every segment, fuse between observations, and return
the final integrated state. tests/test_parity_torch.py pins both the
divergence and the parity against the intended reference semantics.

TPU formulation: the weight-tied loop is a ``lax.scan`` over the dense GCL.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import Linear, Params
from ..ops.dense_graph import SEGNOGCL


@dataclasses.dataclass(frozen=True)
class InvariantTemporalAttention:
    """Softmax-over-time attention from (|v|, h), model.py:126-139."""

    in_dim: int
    hidden_dim: int = 32

    @property
    def l1(self) -> Linear:
        return Linear(self.in_dim + 1, self.hidden_dim)

    @property
    def l2(self) -> Linear:
        return Linear(self.hidden_dim, 1)

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"l1": self.l1.init(k1), "l2": self.l2.init(k2)}

    def __call__(self, p: Params, vel_seq, his_seq):
        """vel_seq: [L, ..., 3]; his_seq: [L, ..., F] -> weights [L, ..., 1]."""
        speed = jnp.linalg.norm(vel_seq, axis=-1, keepdims=True)
        feats = jnp.concatenate([speed, his_seq], axis=-1)
        w = self.l2(p["l2"], jnp.tanh(self.l1(p["l1"], feats)))
        return jax.nn.softmax(w, axis=0)


@dataclasses.dataclass(frozen=True)
class SEGNO:
    in_node_nf: int = 1          # [|v|] (model_confs.yaml SEGNO: in_node_nf: 1)
    in_edge_nf: int = 2          # [charge/mass product, ||x_i-x_j||^2]
    hidden_nf: int = 64
    n_layers: int = 8            # default integration steps; live path uses T
    recurrent: bool = True
    coords_weight: float = 1.0
    tanh: bool = False
    varDT: bool = False
    multiple_agg: str | None = None  # None | 'sum' | 'attn'

    @property
    def embedding(self) -> Linear:
        return Linear(self.in_node_nf, self.hidden_nf)

    @property
    def gcl(self) -> SEGNOGCL:
        return SEGNOGCL(self.hidden_nf, in_edge_nf=self.in_edge_nf,
                        act=jax.nn.silu, recurrent=self.recurrent,
                        coords_weight=self.coords_weight, tanh=self.tanh)

    @property
    def attn(self) -> InvariantTemporalAttention:
        return InvariantTemporalAttention(self.hidden_nf, self.hidden_nf)

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        p = {"embedding": self.embedding.init(k1), "gcl": self.gcl.init(k2)}
        if self.multiple_agg == "attn":
            p["attn"] = self.attn.init(k3)
        return p

    def integrate(self, p: Params, h, x, v, edge_attr, steps: int,
                  edge_mask=None):
        """forward_step (model.py:95-102): `steps` GCL applications, 1/steps."""
        inv = 1.0 / steps

        def body(carry, _):
            h, x, v = carry
            h, x, v = self.gcl(p["gcl"], h, x, v, edge_attr, inv,
                               edge_mask=edge_mask)
            return (h, x, v), None

        (h, x, v), _ = jax.lax.scan(body, (h, x, v), length=steps)
        return h, x, v

    def integrate_masked(self, p: Params, h, x, v, edge_attr, steps,
                         max_steps: int, edge_mask=None):
        """``integrate`` with a TRACED step count: runs ``max_steps`` GCL
        applications and masks updates past ``steps`` (bit-identical result,
        reverse-mode differentiable — a dynamic-trip-count while_loop is
        not). Enables per-batch varDT segment lengths inside one jitted
        epoch program (the reference resamples per batch,
        SEGNO/train_nbody.py:100)."""
        # reciprocal in fp32, then adopt the compute dtype: a weak-typed
        # Python float would be exact here too, but steps is traced — an
        # fp32 array would silently promote a bf16 carry out of the scan
        inv = (1.0 / steps.astype(jnp.float32)).astype(x.dtype)

        def body(carry, i):
            h, x, v = carry
            h2, x2, v2 = self.gcl(p["gcl"], h, x, v, edge_attr, inv,
                                  edge_mask=edge_mask)
            keep = i < steps
            return (jnp.where(keep, h2, h), jnp.where(keep, x2, x),
                    jnp.where(keep, v2, v)), None

        (h, x, v), _ = jax.lax.scan(body, (h, x, v), jnp.arange(max_steps))
        return h, x, v

    def forward_dynamic(self, p: Params, his, x, v, edge_attr, seg_lens,
                        T: int = 10, max_interior: int = None,
                        edge_mask=None):
        """Multi-input forward with traced per-batch segment lengths.

        his/x/v: [L, B, N, .]; seg_lens: [L-1] int array (traced) — the
        inter-snapshot integration lengths diff(in_steps); the final segment
        is the static T (model.py:71: steps = diff(in_steps) + [T]).
        ``max_interior`` is the static upper bound on any interior segment
        (varDT samples in [1, T//L), train_nbody.py:100).
        Returns (x, h, v) like __call__.
        """
        L = x.shape[0]
        assert max_interior is not None and L >= 2
        h = self.embedding(p["embedding"], his)
        h_, x_, v_ = h[0], x[0], v[0]
        for i in range(L - 1):
            hi, xi, vi = self.integrate_masked(
                p, h_, x_, v_, edge_attr, seg_lens[i], max_interior,
                edge_mask=edge_mask)
            h_, x_, v_ = self.fuse(p, (h[i + 1], x[i + 1], v[i + 1]),
                                   (hi, xi, vi))
        h_, x_, v_ = self.integrate(p, h_, x_, v_, edge_attr, T,
                                    edge_mask=edge_mask)
        return x_, h_, v_

    def fuse(self, p: Params, obs, pred):
        """Blend a predicted state with the next observed snapshot."""
        (ho, xo, vo), (hp, xp, vp) = obs, pred
        if self.multiple_agg == "sum":
            return ho + hp, xo + xp, vo + vp
        if self.multiple_agg == "attn":
            hs = jnp.stack([ho, hp], axis=0)
            xs = jnp.stack([xo, xp], axis=0)
            vs = jnp.stack([vo, vp], axis=0)
            w = self.attn(p["attn"], vs, hs)
            return ((w * hs).sum(0), (w * xs).sum(0), (w * vs).sum(0))
        raise ValueError(f"Invalid multiple_agg: {self.multiple_agg}")

    def __call__(self, p: Params, his, x, v, edge_attr, T: int = 10,
                 in_steps=None, edge_mask=None):
        """Predict the state T integrator steps ahead.

        Single input: his [B, N, F]; x, v [B, N, 3]; edge_attr [B, N, N, E].
        Multiple inputs: extra leading axis L on his/x/v; ``in_steps`` is the
        tuple of (static) input frame offsets; segment lengths are
        diff(in_steps) + [T] (model.py:71).

        Returns (x, h, v), each [B, N, .].
        """
        if x.ndim == 3 + 1:  # [L, B, N, 3]
            assert in_steps is not None
            steps = [int(b) - int(a) for a, b in zip(in_steps[:-1], in_steps[1:])]
            steps = steps + [T]
        else:
            x, v, his = x[None], v[None], his[None]
            steps = [T]

        h = self.embedding(p["embedding"], his)     # [L, B, N, H]

        h_, x_, v_ = h[0], x[0], v[0]
        for i, step in enumerate(steps):
            hi, xi, vi = self.integrate(p, h_, x_, v_, edge_attr, step,
                                        edge_mask=edge_mask)
            if i < len(steps) - 1:
                h_, x_, v_ = self.fuse(p, (h[i + 1], x[i + 1], v[i + 1]),
                                       (hi, xi, vi))
            else:
                h_, x_, v_ = hi, xi, vi
        return x_, h_, v_
