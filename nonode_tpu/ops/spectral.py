"""Temporal spectral (Fourier neural operator) ops over the leading T axis.

Mirrors EGNO/model/layer_no.py:
- get_timestep_embedding (:8-17) — sinusoidal embedding of [B, T] timesteps.
- SpectralConv1d / compl_mul1d (:74-109) — rfft over time, multiply the first
  ``modes`` frequencies with learned complex weights stored as
  ``[in, out, modes, 2]`` floats (uniform(0, scale) init), irfft back to T.
- TimeConv (:112-126) — spectral conv + LeakyReLU, residual.
- SpectralConv1d_x / TimeConv_x (:129-178) — the same over a stacked
  equivariant channel pair (x - x_mean, v) with scale-0.1 init and a plain
  (no-nonlinearity) residual.

The reference pins the FFT path to fp32 under autocast; we compute the FFT in
fp32 explicitly.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..nn import Params


def timestep_embedding(timesteps, embedding_dim: int, max_positions: int = 10000):
    """Sinusoidal embedding. timesteps: [B, T] -> [B, T, embedding_dim]."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


@dataclasses.dataclass(frozen=True)
class SpectralConv:
    """1D Fourier layer over the leading time axis of [T, ..., C] tensors."""

    in_ch: int
    out_ch: int
    modes: int
    scale: float | None = None  # default: 1/(in*out) as in SpectralConv1d

    @property
    def _scale(self) -> float:
        return self.scale if self.scale is not None else 1.0 / (self.in_ch * self.out_ch)

    def init(self, key) -> Params:
        w = jax.random.uniform(key, (self.in_ch, self.out_ch, self.modes, 2),
                               dtype=jnp.float32) * self._scale
        return {"w": w}

    def __call__(self, p: Params, x):
        t = x.shape[0]
        x_ft = jnp.fft.rfft(x.astype(jnp.float32), axis=0)[: self.modes]
        # the FFT path is fp32-pinned like the reference's autocast-disabled
        # spectral conv; weights are upcast here under bf16 compute policies
        w32 = p["w"].astype(jnp.float32)
        w = jax.lax.complex(w32[..., 0], w32[..., 1])         # [in, out, modes]
        out_ft = jnp.einsum("m...i,iom->m...o", x_ft, w,
                            precision=jax.lax.Precision.HIGHEST)
        # irfft zero-pads the missing high frequencies, as torch irfftn(s=[T]).
        return jnp.fft.irfft(out_ft, n=t, axis=0)


@dataclasses.dataclass(frozen=True)
class TimeConv:
    """h-channel time conv: x + LeakyReLU(spectral(x))."""

    ch: int
    modes: int

    @property
    def conv(self) -> SpectralConv:
        return SpectralConv(self.ch, self.ch, self.modes)

    def init(self, key) -> Params:
        return {"t_conv": self.conv.init(key)}

    def __call__(self, p: Params, x):
        h = jax.nn.leaky_relu(self.conv(p["t_conv"], x), 0.01)
        return x + h.astype(x.dtype)   # keep the compute dtype through the
        #                                residual (the conv itself is fp32)


@dataclasses.dataclass(frozen=True)
class TimeConvX:
    """Equivariant-pair time conv: x + spectral(x), no nonlinearity.

    Operates on [T, ..., 3, 2] stacks of (x - x_mean, v).
    """

    ch: int  # = 2 in the reference
    modes: int

    @property
    def conv(self) -> SpectralConv:
        return SpectralConv(self.ch, self.ch, self.modes, scale=0.1)

    def init(self, key) -> Params:
        return {"t_conv": self.conv.init(key)}

    def __call__(self, p: Params, x):
        return x + self.conv(p["t_conv"], x).astype(x.dtype)
