"""Runnable stubs for the reference's external deps (wandb, torch_geometric).

The reference imports ``wandb`` and ``torch_geometric`` (neither installed
here). The only torch_geometric surface it actually uses is
``utils.to_dense_batch`` (root utils.py:3, EGNO/main_simulation_simple_no.py:9,
SEGNO/train_nbody.py:7) and ``data.Data.from_dict`` (main.py:11,190), and the
only wandb surface is init/log/finish/Artifact in disabled mode
(main.py:152,193-200). These stubs implement that surface for real so the
reference trains and writes its ``*_results.pt`` artifact unmodified —
required for the end-to-end trained-parity anchor (PARITY_E2E.md).
"""

from __future__ import annotations

import sys
import types

REF_PATH = "/root/reference"


def to_dense_batch(x, batch=None, fill_value=0.0, max_num_nodes=None,
                   batch_size=None):
    """torch_geometric.utils.to_dense_batch semantics for sorted ``batch``
    vectors (the only kind the reference produces): [sum(N_b), ...] ->
    ([B, N_max, ...], mask [B, N_max])."""
    import torch

    if batch is None:
        mask = torch.ones(1, x.size(0), dtype=torch.bool, device=x.device)
        return x.unsqueeze(0), mask
    num_graphs = batch_size or int(batch.max()) + 1
    counts = torch.bincount(batch, minlength=num_graphs)
    n_max = max_num_nodes or int(counts.max())
    ptr = torch.cat([torch.zeros(1, dtype=torch.long, device=batch.device),
                     counts.cumsum(0)[:-1]])
    pos = torch.arange(batch.size(0), device=batch.device) - ptr[batch]
    out = x.new_full((num_graphs, n_max, *x.shape[1:]), fill_value)
    mask = torch.zeros(num_graphs, n_max, dtype=torch.bool, device=x.device)
    out[batch, pos] = x
    mask[batch, pos] = True
    return out, mask


class Data:
    """Picklable stand-in for torch_geometric.data.Data as the reference uses
    it: a named bag of tensors (main.py:190 ``Data.from_dict(trajectories)``)."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    @classmethod
    def from_dict(cls, d):
        return cls(**d)

    def to_dict(self):
        return dict(self.__dict__)

    def __repr__(self):
        return f"Data({', '.join(self.__dict__)})"


class _WandbRun:
    def __getattr__(self, name):
        return lambda *a, **k: None


class _Artifact:
    def __init__(self, *a, **k):
        pass

    def add_file(self, *a, **k):
        pass

    def save(self, *a, **k):
        pass


def _make_wandb_module():
    m = types.ModuleType("wandb")
    m.init = lambda *a, **k: _WandbRun()
    m.log = lambda *a, **k: None
    m.finish = lambda *a, **k: None
    m.Artifact = _Artifact
    return m


def install():
    """Register the stub modules and put /root/reference on sys.path.
    Idempotent; safe to call before importing any reference module."""
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = _make_wandb_module()

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_utils = types.ModuleType("torch_geometric.utils")
        tg_utils.to_dense_batch = to_dense_batch
        tg_data = types.ModuleType("torch_geometric.data")
        tg_data.Data = Data
        tg.utils = tg_utils
        tg.data = tg_data
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.utils"] = tg_utils
        sys.modules["torch_geometric.data"] = tg_data
    else:
        # tests may have pre-registered bare stubs; make them functional
        tg = sys.modules["torch_geometric"]
        tg_utils = sys.modules.setdefault(
            "torch_geometric.utils", types.ModuleType("torch_geometric.utils"))
        if getattr(tg_utils, "to_dense_batch", None) is None:
            tg_utils.to_dense_batch = to_dense_batch
        tg.utils = tg_utils
        tg_data = sys.modules.setdefault(
            "torch_geometric.data", types.ModuleType("torch_geometric.data"))
        if not hasattr(tg_data, "Data"):
            tg_data.Data = Data
        tg.data = tg_data

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
