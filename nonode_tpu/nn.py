"""Minimal functional module system: static dataclass configs + pytree params.

Parameter layout deliberately matches torch ``nn.Linear`` (``w: [out, in]``,
``b: [out]``, both U(-1/sqrt(fan_in), 1/sqrt(fan_in)) at init) so that
reference checkpoints can be ported tensor-for-tensor for parity testing.

Reference semantics mirrored here (behavioral, not copied):
- BaseMLP: EGNO/model/basic.py:34-58 (2-layer, optional last_act / residual;
  ``flat`` switches activation to tanh and widens hidden 4x).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


def uniform_init(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class Linear:
    in_dim: int
    out_dim: int
    bias: bool = True

    def init(self, key) -> Params:
        wk, bk = jax.random.split(key)
        bound = 1.0 / np.sqrt(self.in_dim)
        p = {"w": uniform_init(wk, (self.out_dim, self.in_dim), bound)}
        if self.bias:
            p["b"] = uniform_init(bk, (self.out_dim,), bound)
        return p

    def __call__(self, p: Params, x):
        # HIGHEST pins fp32 MXU passes: the TPU default (bf16 single-pass)
        # is too lossy for the physics parity targets at these tiny sizes.
        # bf16 inputs (the opt-in speed mode) take the native single pass.
        prec = (None if x.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        y = jnp.matmul(x, p["w"].T, precision=prec)
        if self.bias:
            y = y + p["b"]
        return y


def xavier_uniform_init(key, shape, gain=1.0, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ for a [out, in] weight."""
    fan_out, fan_in = shape
    bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return uniform_init(key, shape, bound, dtype)


@dataclasses.dataclass(frozen=True)
class MLP:
    """Two-layer MLP with the reference BaseMLP's exact switches."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    act: Callable = jax.nn.silu
    last_act: bool = False
    residual: bool = False
    flat: bool = False

    def __post_init__(self):
        if self.residual:
            assert self.out_dim == self.in_dim

    @property
    def _hidden(self) -> int:
        return 4 * self.hidden_dim if self.flat else self.hidden_dim

    @property
    def _act(self) -> Callable:
        return jnp.tanh if self.flat else self.act

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "l1": Linear(self.in_dim, self._hidden).init(k1),
            "l2": Linear(self._hidden, self.out_dim).init(k2),
        }

    def __call__(self, p: Params, x):
        y = self._act(Linear(self.in_dim, self._hidden)(p["l1"], x))
        y = Linear(self._hidden, self.out_dim)(p["l2"], y)
        if self.last_act:
            y = self._act(y)
        return x + y if self.residual else y

    def from_preact(self, p: Params, pre):
        """Finish the MLP from a precomputed first-layer pre-activation
        (see ops.dense_graph.first_edge_linear: the l1 matmul over a wide
        pairwise concat is evaluated as per-segment matmuls instead)."""
        assert not self.residual
        y = Linear(self._hidden, self.out_dim)(p["l2"], self._act(pre))
        return self._act(y) if self.last_act else y


def silu(x):
    return jax.nn.silu(x)


def leaky_relu(x, negative_slope=0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
