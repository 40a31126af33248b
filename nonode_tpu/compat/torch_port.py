"""Port reference PyTorch checkpoints into nonode_tpu parameter pytrees.

Lets users of the reference repo load their trained ``.pth`` state_dicts
directly (and powers the golden-parity test suite). Mapping targets:

- EGNO state_dict layout: EGNO/model/egno.py + EGNO/model/basic.py
  (``layers.i.edge_message_net.scalar_net.mlp.{0,2}``, ``coord_net.mlp``,
  ``node_v_net.mlp``, ``node_net.mlp``, ``time_conv_modules.i.t_conv.weights1``,
  ``time_conv_x_modules.i.t_conv.weights1``, ``embedding``).
- SEGNO state_dict layout: SEGNO/models/model.py + SEGNO/models/models/gcl.py
  (``embedding``, ``module.{edge_mlp,node_mlp,coord_mlp,coord_mlp_vel}``,
  ``enc_attn_net.attn_mlp``). ``coord_mlp_vel`` has no consumer in the live
  reference forward and is dropped.

Our Linear stores ``w: [out, in]`` exactly like torch, so tensors map 1:1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _t(x):
    return jnp.asarray(np.asarray(x.detach().cpu() if hasattr(x, "detach") else x,
                                  dtype=np.float32))


def _linear(sd, prefix):
    p = {"w": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _mlp(sd, prefix):
    """torch nn.Sequential(Linear, act, Linear[, act]) -> {l1, l2}."""
    return {"l1": _linear(sd, f"{prefix}.0"), "l2": _linear(sd, f"{prefix}.2")}


def egno_params_from_state_dict(sd, n_layers: int, use_time_conv: bool = True):
    p = {
        "embedding": _linear(sd, "embedding"),
        "layers": [],
    }
    for i in range(n_layers):
        lp = {
            "edge_net": _mlp(sd, f"layers.{i}.edge_message_net.scalar_net.mlp"),
            "coord_net": _mlp(sd, f"layers.{i}.coord_net.mlp"),
        }
        if f"layers.{i}.node_v_net.mlp.0.weight" in sd:
            lp["node_v_net"] = _mlp(sd, f"layers.{i}.node_v_net.mlp")
        if f"layers.{i}.node_net.mlp.0.weight" in sd:
            lp["node_net"] = _mlp(sd, f"layers.{i}.node_net.mlp")
        p["layers"].append(lp)
    if use_time_conv:
        p["time_conv"] = [
            {"t_conv": {"w": _t(sd[f"time_conv_modules.{i}.t_conv.weights1"])}}
            for i in range(n_layers)]
        p["time_conv_x"] = [
            {"t_conv": {"w": _t(sd[f"time_conv_x_modules.{i}.t_conv.weights1"])}}
            for i in range(n_layers)]
    return p


def egno_state_dict_from_params(params, n_layers: int):
    """Inverse of egno_params_from_state_dict: export a nonode_tpu EGNO
    param pytree as a reference-layout torch state_dict (numpy values;
    caller wraps in torch tensors). Enables running reference tooling —
    e.g. the torch rollout (main_simulation_simple_no.py:342-384) — on
    jax-trained weights for cross-framework adjudication."""
    out = {}

    def put_linear(prefix, p):
        out[f"{prefix}.weight"] = np.asarray(p["w"])
        if "b" in p:
            out[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_mlp(prefix, p):
        put_linear(f"{prefix}.0", p["l1"])
        put_linear(f"{prefix}.2", p["l2"])

    put_linear("embedding", params["embedding"])
    for i, lp in enumerate(params["layers"]):
        put_mlp(f"layers.{i}.edge_message_net.scalar_net.mlp", lp["edge_net"])
        put_mlp(f"layers.{i}.coord_net.mlp", lp["coord_net"])
        if "node_v_net" in lp:
            put_mlp(f"layers.{i}.node_v_net.mlp", lp["node_v_net"])
        if "node_net" in lp:
            put_mlp(f"layers.{i}.node_net.mlp", lp["node_net"])
    if "time_conv" in params:
        for i in range(n_layers):
            out[f"time_conv_modules.{i}.t_conv.weights1"] = \
                np.asarray(params["time_conv"][i]["t_conv"]["w"])
            out[f"time_conv_x_modules.{i}.t_conv.weights1"] = \
                np.asarray(params["time_conv_x"][i]["t_conv"]["w"])
    return out


def segno_params_from_state_dict(sd):
    p = {
        "embedding": _linear(sd, "embedding"),
        "gcl": {
            "edge_mlp": _mlp(sd, "module.edge_mlp"),
            "node_mlp": _mlp(sd, "module.node_mlp"),
            "coord_mlp_l1": _linear(sd, "module.coord_mlp.0"),
            "coord_mlp_l2": _linear(sd, "module.coord_mlp.2"),
        },
    }
    # module.coords_range never appears in a real reference state dict: the
    # nn.Parameter(torch.ones(1))*3 product (gcl.py:59) is an unregistered
    # constant tensor, matched by SEGNOGCL.COORDS_RANGE.
    if "enc_attn_net.attn_mlp.0.weight" in sd:
        p["attn"] = {"l1": _linear(sd, "enc_attn_net.attn_mlp.0"),
                     "l2": _linear(sd, "enc_attn_net.attn_mlp.2")}
    return p
