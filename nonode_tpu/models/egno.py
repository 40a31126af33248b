"""EGNO — Equivariant Graph Neural Operator, dense TPU formulation.

Behavioral parity with EGNO (EGNO/model/egno.py:8-111): an EGNN stack where
every layer is preceded by temporal spectral convolutions on the node features
(TimeConv) and on the stacked equivariant pair (x - x_mean, v) (TimeConv_x).
The model decodes all ``num_timesteps`` future frames in one forward pass.

Differences in formulation (not behavior):
- The reference tiles nodes/edges T-fold into one big sparse graph with
  per-step edge-index offsets (egno.py:53-96). Here the time axis is a real
  leading axis: states are [T, B, N, .] and the dense EGNN layer vmaps over
  (T, B) implicitly.
- ``repeat_elements_to_exact_shape`` (EGNO/utils.py:115-131), which maps
  ``num_inputs`` input snapshots onto T slots, becomes a static gather with
  the same slot layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import Linear, Params
from ..ops.dense_graph import EGNNLayer
from ..ops.spectral import TimeConv, TimeConvX, timestep_embedding


def input_slot_map(num_inputs: int, t: int) -> list[int]:
    """Slot s -> input index, matching repeat_elements_to_exact_shape:
    each input repeated T//L times in order, remainder slots take the last."""
    k, rem = divmod(t, num_inputs)
    idx = [i for i in range(num_inputs) for _ in range(k)]
    idx += [num_inputs - 1] * rem
    return idx


def effective_num_modes(num_timesteps: int, num_modes: int) -> int:
    """The reference's clamp rule (egno.py:26)."""
    if num_timesteps != 5:
        return min(num_timesteps, num_modes)
    return min(num_modes, 3)


@dataclasses.dataclass(frozen=True)
class EGNO:
    n_layers: int = 4
    in_node_nf: int = 2          # [|v|, charge] (model_confs.yaml: in_node_nf: 2)
    in_edge_nf: int = 2          # [charge product, ||x_i-x_j||^2]
    hidden_nf: int = 64
    num_modes: int = 2
    num_timesteps: int = 10
    time_emb_dim: int = 32
    num_inputs: int = 1
    varDT: bool = False
    with_v: bool = True
    flat: bool = False
    norm: bool = False
    use_time_conv: bool = True

    @property
    def _in_nf_total(self) -> int:
        # time embedding appended to node features; doubled when there are
        # multiple input snapshots (in + out embeddings), egno.py:13-16.
        mult = 2 if self.num_inputs > 1 else 1
        return self.in_node_nf + self.time_emb_dim * mult

    @property
    def _modes(self) -> int:
        return effective_num_modes(self.num_timesteps, self.num_modes)

    @property
    def embedding(self) -> Linear:
        return Linear(self._in_nf_total, self.hidden_nf)

    @property
    def layer(self) -> EGNNLayer:
        return EGNNLayer(self.hidden_nf, self.in_edge_nf, act=jax.nn.silu,
                         with_v=self.with_v, flat=self.flat, norm=self.norm)

    @property
    def time_conv(self) -> TimeConv:
        return TimeConv(self.hidden_nf, self._modes)

    @property
    def time_conv_x(self) -> TimeConvX:
        return TimeConvX(2, self._modes)

    def init(self, key) -> Params:
        keys = jax.random.split(key, 3 * self.n_layers + 1)
        p = {"embedding": self.embedding.init(keys[0])}
        p["layers"] = [self.layer.init(keys[1 + i]) for i in range(self.n_layers)]
        if self.use_time_conv:
            p["time_conv"] = [self.time_conv.init(keys[1 + self.n_layers + i])
                              for i in range(self.n_layers)]
            p["time_conv_x"] = [self.time_conv_x.init(keys[1 + 2 * self.n_layers + i])
                                for i in range(self.n_layers)]
        return p

    def __call__(self, p: Params, loc, vel, nodes, edge_attr, loc_mean,
                 timesteps_out=None, timesteps_in=None, edge_mask=None):
        """Decode ``num_timesteps`` frames.

        Single input (num_inputs == 1):
          loc, vel, loc_mean: [B, N, 3]; nodes: [B, N, F]; edge_attr: [B, N, N, E]
        Multiple inputs:
          leading extra axis L=num_inputs on all of the above.
        timesteps_out: [B, T] ints (defaults to arange(T));
        timesteps_in: [B, L] ints (defaults to arange(-L+1, 1)).

        Returns x, v, h with shape [T, B, N, .].
        """
        t = self.num_timesteps
        multi = self.num_inputs > 1
        b = loc.shape[1] if multi else loc.shape[0]

        if timesteps_out is None:
            timesteps_out = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32), (b, t))
        emb_out = timestep_embedding(timesteps_out, self.time_emb_dim)  # [B, T, Ht]

        if multi:
            slot = jnp.asarray(input_slot_map(self.num_inputs, t))
            if timesteps_in is None:
                timesteps_in = jnp.broadcast_to(
                    jnp.arange(-self.num_inputs + 1, 1, dtype=jnp.float32),
                    (b, self.num_inputs))
            t_in_slots = jnp.take(timesteps_in, slot, axis=1)           # [B, T]
            emb_in = timestep_embedding(t_in_slots, self.time_emb_dim)  # [B, T, Ht]
            # map L input snapshots onto T slots
            x = jnp.take(loc, slot, axis=0)          # [T, B, N, 3]
            v = jnp.take(vel, slot, axis=0)
            h0 = jnp.take(nodes, slot, axis=0)       # [T, B, N, F]
            x_mean = jnp.take(loc_mean, slot, axis=0)
            e_fea = jnp.take(edge_attr, slot, axis=0)  # [T, B, N, N, E]
            embs = [jnp.transpose(emb_in, (1, 0, 2)), jnp.transpose(emb_out, (1, 0, 2))]
        else:
            x = jnp.broadcast_to(loc, (t, *loc.shape))
            v = jnp.broadcast_to(vel, (t, *vel.shape))
            h0 = jnp.broadcast_to(nodes, (t, *nodes.shape))
            x_mean = jnp.broadcast_to(loc_mean, (t, *loc_mean.shape))
            e_fea = jnp.broadcast_to(edge_attr, (t, *edge_attr.shape))
            embs = [jnp.transpose(emb_out, (1, 0, 2))]                  # [T, B, Ht]

        n = x.shape[2]
        # embeddings adopt the node-feature dtype so the opt-in bf16 compute
        # mode doesn't promote h back to fp32 through the concat (the fp32
        # parity mode is unaffected: embeddings are fp32 already)
        embs = [jnp.broadcast_to(e[:, :, None, :], (t, b, n, e.shape[-1]))
                .astype(h0.dtype) for e in embs]
        h = jnp.concatenate([h0, *embs], axis=-1)    # [T, B, N, F + k*Ht]
        h = self.embedding(p["embedding"], h)        # [T, B, N, H]

        for i in range(self.n_layers):
            if self.use_time_conv:
                h = self.time_conv(p["time_conv"][i], h)
                stacked = jnp.stack([x - x_mean, v], axis=-1)   # [T, B, N, 3, 2]
                out = self.time_conv_x(p["time_conv_x"][i], stacked)
                x = out[..., 0] + x_mean
                v = out[..., 1]
            x, v, h = self.layer(p["layers"][i], x, h, e_fea, v=v,
                                 edge_mask=edge_mask)
        return x, v, h
