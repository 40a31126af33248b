"""Config system: dataclasses with the reference's model_confs.yaml defaults,
optional YAML overrides, CLI precedence (CLI > YAML > defaults, main.py:83-84).

Reference values: model_confs.yaml:1-36 (EGNO: 4 layers, hidden 64, modes 2,
time_emb 32, lr 1e-4, wd 1e-8; SEGNO: 8 layers, hidden 64, recurrent,
lr 5e-3, wd 1e-12; both num_timesteps 10).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import yaml


@dataclasses.dataclass
class EGNOConfig:
    num_timesteps: int = 10
    n_layers: int = 4
    hidden_nf: int = 64
    flat: bool = False
    norm: bool = False
    time_emb_dim: int = 32
    in_node_nf: int = 2
    in_edge_nf: int = 2
    with_v: bool = True
    num_modes: int = 2
    lr: float = 1e-4
    weight_decay: float = 1e-8


@dataclasses.dataclass
class SEGNOConfig:
    num_timesteps: int = 10
    in_node_nf: int = 1
    in_edge_nf: int = 2
    hidden_nf: int = 64
    n_layers: int = 8
    recurrent: bool = True
    norm_diff: bool = False
    tanh: bool = False
    lr: float = 5e-3
    weight_decay: float = 1e-12


def load_model_config(model: str, config_path: str | Path | None = None):
    """Build the model config, applying YAML overrides when a file is given.

    The YAML schema matches the reference's model_confs.yaml:
    ``{EGNO|SEGNO}: {num_timesteps, model_params: {...}, training_params:
    {lr, weight_decay}}``.
    """
    cls = {"egno": EGNOConfig, "segno": SEGNOConfig}[model]
    cfg = cls()
    if config_path is not None:
        # fail loudly on a missing file like the reference's open(args.config)
        # (main.py:69) — a typo'd path or wrong cwd must not silently train
        # with built-in defaults. Pass None for the pure-defaults config.
        with open(config_path) as f:
            raw = yaml.safe_load(f)[model.upper()]
        fields = {f.name for f in dataclasses.fields(cls)}
        updates = {}
        if "num_timesteps" in raw:
            updates["num_timesteps"] = raw["num_timesteps"]
        for k, v in raw.get("model_params", {}).items():
            if k in fields:
                updates[k] = v
        tp = raw.get("training_params", {})
        if "lr" in tp:
            updates["lr"] = float(tp["lr"])
        if "weight_decay" in tp:
            updates["weight_decay"] = float(tp["weight_decay"])
        cfg = dataclasses.replace(cfg, **updates)
    return cfg
