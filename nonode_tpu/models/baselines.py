"""Baseline models from the reference inventory, dense TPU formulation.

Parity targets (EGNO/model/basic.py): GNN (:252-274), Linear_dynamics
(:277-285), RF_vel (:288-339), FullMLP (:352-367), EGMN/EquivariantScalarNet
(:61-104, :215-231). None are wired into the unified driver in the reference;
they are part of the model-zoo surface.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import MLP, Linear, Params, xavier_uniform_init
from ..ops.dense_graph import masked_mean_j, offdiag_mask, pairwise_diff


@dataclasses.dataclass(frozen=True)
class GNN:
    """Message-passing baseline: h-only updates + 3D decoder."""

    n_layers: int
    in_node_nf: int
    in_edge_nf: int
    hidden_nf: int
    flat: bool = False

    @property
    def embedding(self) -> Linear:
        return Linear(self.in_node_nf, self.hidden_nf)

    @property
    def edge_net(self) -> MLP:
        return MLP(self.in_edge_nf + 2 * self.hidden_nf, self.hidden_nf,
                   self.hidden_nf, jax.nn.silu, flat=self.flat)

    @property
    def node_net(self) -> MLP:
        return MLP(2 * self.hidden_nf, self.hidden_nf, self.hidden_nf,
                   jax.nn.silu, flat=self.flat)

    @property
    def decoder(self) -> MLP:
        return MLP(self.hidden_nf, self.hidden_nf, 3, jax.nn.silu)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 2 * self.n_layers + 2)
        return {
            "embedding": self.embedding.init(ks[0]),
            "edge": [self.edge_net.init(ks[1 + i]) for i in range(self.n_layers)],
            "node": [self.node_net.init(ks[1 + self.n_layers + i])
                     for i in range(self.n_layers)],
            "decoder": self.decoder.init(ks[-1]),
        }

    def __call__(self, p: Params, h, edge_fea):
        """h: [..., N, F]; edge_fea: [..., N, N, E] -> [..., N, 3]."""
        n = h.shape[-2]
        mask = offdiag_mask(n, h.dtype)
        h = self.embedding(p["embedding"], h)
        for i in range(self.n_layers):
            hi = jnp.broadcast_to(h[..., :, None, :],
                                  (*edge_fea.shape[:-1], h.shape[-1]))
            hj = jnp.broadcast_to(h[..., None, :, :],
                                  (*edge_fea.shape[:-1], h.shape[-1]))
            msg = self.edge_net(p["edge"][i],
                                jnp.concatenate([hi, hj, edge_fea], axis=-1))
            agg = masked_mean_j(msg, mask)
            h = h + self.node_net(p["node"][i],
                                  jnp.concatenate([agg, h], axis=-1))
        return self.decoder(p["decoder"], h)


@dataclasses.dataclass(frozen=True)
class LinearDynamics:
    """x + v * t with a single learned scalar t (basic.py:277-285)."""

    def init(self, key) -> Params:
        del key
        return {"time": jnp.ones((1,))}

    def __call__(self, p: Params, x, v):
        return x + v * p["time"]


@dataclasses.dataclass(frozen=True)
class RFVel:
    """Radial-field baseline with velocity gate (basic.py:288-339)."""

    hidden_nf: int = 64
    edge_attr_nf: int = 0
    n_layers: int = 4

    @property
    def vel_mlp(self) -> MLP:
        return MLP(1, self.hidden_nf, 1, jax.nn.silu)

    @property
    def phi_l1(self) -> Linear:
        return Linear(1 + self.edge_attr_nf, self.hidden_nf)

    @property
    def phi_l2(self) -> Linear:
        return Linear(self.hidden_nf, 1, bias=False)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4 * self.n_layers)
        layers = []
        for i in range(self.n_layers):
            l2 = {"w": xavier_uniform_init(ks[4 * i + 2], (1, self.hidden_nf),
                                           gain=0.001)}
            layers.append({
                "vel_mlp": self.vel_mlp.init(ks[4 * i]),
                "phi_l1": self.phi_l1.init(ks[4 * i + 1]),
                "phi_l2": l2,
            })
        return {"layers": layers}

    def __call__(self, p: Params, vel_norm, x, vel, edge_attr):
        """vel_norm: [..., N, 1]; x, vel: [..., N, 3]; edge_attr [..., N, N, E]."""
        n = x.shape[-2]
        mask = offdiag_mask(n, x.dtype)
        for lp in p["layers"]:
            diff = pairwise_diff(x)
            radial = jnp.sqrt((diff * diff).sum(-1, keepdims=True))
            e_in = jnp.concatenate([radial, edge_attr], axis=-1)
            # RF_vel passes act_fn=nn.SiLU() into GCL_rf_vel (basic.py:289,
            # 295), overriding GCL_rf_vel's LeakyReLU default — phi and the
            # velocity gate share the same SiLU
            e = jax.nn.silu(self.phi_l1(lp["phi_l1"], e_in))
            e = jnp.tanh(self.phi_l2(lp["phi_l2"], e))
            m = diff * e
            x = x + masked_mean_j(m, mask)
            x = x + vel * self.vel_mlp(lp["vel_mlp"], vel_norm)
        return x


@dataclasses.dataclass(frozen=True)
class EquivariantScalarNet:
    """Universal O(n)-equivariant net via the Gram matrix of input vectors
    (basic.py:61-104): scalars = flatten(Z^T Z) [+ extra scalars] -> MLP;
    output vector = Z @ vec_scalars; output scalars from a second head."""

    n_vector_input: int
    hidden_dim: int
    n_scalar_input: int = 0
    norm: bool = True
    flat: bool = True

    @property
    def in_scalar_net(self) -> MLP:
        return MLP(self.n_vector_input ** 2 + self.n_scalar_input,
                   self.hidden_dim, self.hidden_dim, jax.nn.silu,
                   last_act=True, flat=self.flat)

    @property
    def out_vector_net(self) -> MLP:
        return MLP(self.hidden_dim, self.hidden_dim, self.n_vector_input,
                   jax.nn.silu, flat=self.flat)

    @property
    def out_scalar_net(self) -> MLP:
        return MLP(self.hidden_dim, self.hidden_dim, self.hidden_dim,
                   jax.nn.silu, flat=self.flat)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 3)
        return {"in_scalar": self.in_scalar_net.init(ks[0]),
                "out_vector": self.out_vector_net.init(ks[1]),
                "out_scalar": self.out_scalar_net.init(ks[2])}

    def __call__(self, p: Params, vectors, scalars=None):
        """vectors: [..., 3, K] stack of K vectors (or list of [..., 3]).
        Returns (vector [..., 3], scalars [..., H])."""
        if isinstance(vectors, (list, tuple)):
            z = jnp.stack(vectors, axis=-1)
        else:
            z = vectors
        k = z.shape[-1]
        gram = jnp.einsum("...dk,...dl->...kl", z, z)
        s = gram.reshape(*gram.shape[:-2], k * k)
        if self.norm:
            nrm = jnp.sqrt((s * s).sum(-1, keepdims=True))
            s = s / jnp.maximum(nrm, 1e-12)
        if scalars is not None:
            s = jnp.concatenate([s, scalars], axis=-1)
        s = self.in_scalar_net(p["in_scalar"], s)
        vec_w = self.out_vector_net(p["out_vector"], s)
        vector = jnp.einsum("...dk,...k->...d", z, vec_w)
        return vector, self.out_scalar_net(p["out_scalar"], s)


@dataclasses.dataclass(frozen=True)
class EGMN:
    """Equivariant multi-layer net over a growing vector basis
    (basic.py:215-231): layer i consumes the original vectors plus every
    previously produced vector."""

    n_layers: int
    n_vector_input: int
    hidden_dim: int
    n_scalar_input: int
    norm: bool = False
    flat: bool = False

    def layer(self, i: int) -> EquivariantScalarNet:
        return EquivariantScalarNet(
            n_vector_input=self.n_vector_input + i,
            hidden_dim=self.hidden_dim,
            n_scalar_input=self.n_scalar_input if i == 0 else self.hidden_dim,
            norm=self.norm, flat=self.flat)

    def init(self, key) -> Params:
        ks = jax.random.split(key, self.n_layers)
        return {"layers": [self.layer(i).init(ks[i])
                           for i in range(self.n_layers)]}

    def __call__(self, p: Params, vectors, scalars):
        """vectors: list of [..., 3]; scalars [..., S]."""
        cur = list(vectors)
        for i in range(self.n_layers):
            vector, scalars = self.layer(i)(p["layers"][i], cur, scalars)
            cur.append(vector)
        return cur[-1], scalars


@dataclasses.dataclass(frozen=True)
class FullMLP:
    """Residual MLP stack ignoring graph structure (basic.py:352-367)."""

    in_node_nf: int
    hidden_nf: int
    n_layers: int
    flat: bool = False

    @property
    def block(self) -> MLP:
        return MLP(self.hidden_nf, self.hidden_nf, self.hidden_nf,
                   jax.nn.silu, residual=True, last_act=True, flat=self.flat)

    def init(self, key) -> Params:
        ks = jax.random.split(key, self.n_layers + 2)
        return {
            "embedding": Linear(self.in_node_nf, self.hidden_nf).init(ks[0]),
            "blocks": [self.block.init(ks[1 + i]) for i in range(self.n_layers)],
            "output": Linear(self.hidden_nf, 3).init(ks[-1]),
        }

    def __call__(self, p: Params, x):
        h = Linear(self.in_node_nf, self.hidden_nf)(p["embedding"], x)
        for bp in p["blocks"]:
            h = self.block(bp, h)
        return Linear(self.hidden_nf, 3)(p["output"], h)
