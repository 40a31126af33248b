"""Fused pairwise-message kernel for EGNN/SEGNO layers (forward + VJP).

The hot op of both model families is the same pairwise chain
(EGNO/model/basic.py:147-186, SEGNO/models/models/gcl.py:26-119):

    pre1   = r2 @ Wg + h_i @ Wi + h_j @ Wj + e_fea @ We + b1   [.., N, N, H]
    msg    = act(act(pre1) @ W2 + b2)                          [.., N, N, H]
    cw     = act(msg @ Wc1 + bc1) @ wc2 + bc2                  [.., N, N, 1]
    f      = (x_i - x_j) * cw      (optionally clipped per edge)
    tot_f  = masked_mean_j(f)                                  [.., N, 3]
    tot_m  = masked_sum_j(msg)                                 [.., N, H]

XLA evaluates this as a chain of [G, N, N, H] HBM round-trips (G = B*T
graphs); at the canonical config that is the dominant memory traffic of the
training step. This kernel keeps every pairwise intermediate in VMEM: each
grid step loads a block of GB graphs' node tensors, runs the whole chain on
[GB*N*N, H] tiles, and writes only the reduced [GB, N, 3] / [GB, N, H]
node-level outputs.

The backward pass is a second kernel over the same grid that RECOMPUTES the
forward intermediates per block (flash-attention style — the residuals are
just the layer inputs) and emits input grads plus weight grads; weight
grads accumulate in VMEM across the sequential Mosaic grid via output
blocks pinned to (0, 0).

Everything node-level (the h_i/h_j projections — see
dense_graph.first_edge_linear for why they decompose out of the concat —
the velocity gate, the node MLP, EGNN's post-mean clip) stays outside in
XLA, which fuses those fine.

Dispatch (ops.dense_graph.EGNNLayer / SEGNOGCL with ``fused=True``):
- EGNN:  clips AFTER the mean (basic.py:173-175) -> clip_edges=False.
- SEGNO: clips per edge BEFORE the mean (gcl.py:100) -> clip_edges=True.
- fp32 + SiLU only; one whole graph block must fit VMEM (N <= ~64), else
  the caller falls back to the dense XLA path.

MEASURED VERDICT (TPU v5e, 2026-08-16; see RESULTS.md): ~2x SLOWER than
the dense XLA path at every tested shape (N=5 G=2560: 3.9 vs 1.9 ms
fwd+bwd; N=20 G=640: 7.4 vs 3.5; N=31 G=256: 12.0 vs 5.4), despite
eliminating all [G,N,N,H] HBM round-trips. Cause: the (8,128) tile padding
on the small-trailing-dim pairwise tensors ([R,1] coord scalars pad 128x,
[R,3] vectors 42x) turns the in-VMEM chain into padded VPU work that costs
more than XLA's already-well-fused dense pipeline, and the VMEM budget
forces small graph blocks (many grid steps). A lane-major [C, R] layout
would fix the padding but needs strided pair broadcasts Mosaic does not
express well. Kept as an opt-in (``fused=True``), correctness-tested
(tests/test_pallas_fused.py) record of the experiment; the production path
stays dense XLA + first_edge_linear. Numbers above are honest sync-closed
timings (device->host transfer, not block_until_ready).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST
CLIP = 100.0

# weights tuple layout (all pre-transposed to [in, out] / row vectors):
#   wg [1,H], we [E,H], b1 [1,H], w2 [H,H], b2 [1,H],
#   wc1 [H,H], bc1 [1,H], wc2 [H,1], bc2 [1,1]
N_WEIGHTS = 9


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _dsilu(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _mm(a, b):
    return jnp.matmul(a, b, precision=HIGHEST)


def _rows_t(a, b):
    """[R,K],[R,M] -> [K,M]: contraction over rows (weight-grad matmul)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               precision=HIGHEST)


def _block_graphs(n: int, rows_target: int) -> int:
    """Graphs per grid step so the [GB*N*N, H] working set stays VMEM-sized."""
    return max(1, rows_target // (n * n))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _chain(x, hi, hj, efea, mask, wg, we, b1, w2, b2, wc1, bc1, wc2, bc2,
           *, n, h, e, gb, clip_edges):
    """Forward chain on one block; returns intermediates for fwd and bwd."""
    r = gb * n * n
    rij = x[:, :, None, :] - x[:, None, :, :]             # [GB,N,N,3]
    r2 = (rij * rij).sum(-1, keepdims=True)               # [GB,N,N,1]
    r2f = r2.reshape(r, 1)

    pre1 = r2f * wg + _mm(efea.reshape(r, e), we)         # [R,H]
    pre1 = (pre1.reshape(gb, n, n, h)
            + hi[:, :, None, :] + hj[:, None, :, :]).reshape(r, h) + b1
    a1 = _silu(pre1)
    pre2 = _mm(a1, w2) + b2
    msg = _silu(pre2)
    cpre = _mm(msg, wc1) + bc1
    ca = _silu(cpre)
    cw = _mm(ca, wc2) + bc2                               # [R,1]
    f = rij.reshape(r, 3) * cw
    if clip_edges:
        fc = jnp.clip(f, -CLIP, CLIP)
    else:
        fc = f
    deg = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)   # [N,1]
    mw = mask / deg                                       # [N,N]
    return rij, r2f, pre1, a1, pre2, msg, cpre, ca, cw, f, fc, mask, mw


def _fwd_kernel(x_ref, hi_ref, hj_ref, efea_ref, mask_ref,
                wg_ref, we_ref, b1_ref, w2_ref, b2_ref, wc1_ref, bc1_ref,
                wc2_ref, bc2_ref,
                totf_ref, totm_ref,
                *, n, h, e, gb, clip_edges):
    (rij, r2f, pre1, a1, pre2, msg, cpre, ca, cw, f, fc, mask, mw) = _chain(
        x_ref[...], hi_ref[...], hj_ref[...], efea_ref[...], mask_ref[...],
        wg_ref[...], we_ref[...], b1_ref[...], w2_ref[...], b2_ref[...],
        wc1_ref[...], bc1_ref[...], wc2_ref[...], bc2_ref[...],
        n=n, h=h, e=e, gb=gb, clip_edges=clip_edges)
    r = gb * n * n
    totf_ref[...] = (fc.reshape(gb, n, n, 3)
                     * mw[None, :, :, None]).sum(axis=2)
    totm_ref[...] = (msg.reshape(gb, n, n, h)
                     * mask[None, :, :, None]).sum(axis=2)


def _bwd_kernel(x_ref, hi_ref, hj_ref, efea_ref, mask_ref,
                wg_ref, we_ref, b1_ref, w2_ref, b2_ref, wc1_ref, bc1_ref,
                wc2_ref, bc2_ref,
                wgc_ref, wet_ref, w2t_ref, wc1t_ref, wc2r_ref,
                gtotf_ref, gtotm_ref,
                dx_ref, dhi_ref, dhj_ref, defea_ref,
                dwg_ref, dwe_ref, db1_ref, dw2_ref, db2_ref,
                dwc1_ref, dbc1_ref, dwc2_ref, dbc2_ref,
                *, n, h, e, gb, clip_edges):
    (rij, r2f, pre1, a1, pre2, msg, cpre, ca, cw, f, fc, mask, mw) = _chain(
        x_ref[...], hi_ref[...], hj_ref[...], efea_ref[...], mask_ref[...],
        wg_ref[...], we_ref[...], b1_ref[...], w2_ref[...], b2_ref[...],
        wc1_ref[...], bc1_ref[...], wc2_ref[...], bc2_ref[...],
        n=n, h=h, e=e, gb=gb, clip_edges=clip_edges)
    r = gb * n * n
    rijf = rij.reshape(r, 3)

    # d tot_f -> per-edge force grad (mean weights; clip gate for SEGNO)
    gf = (gtotf_ref[...][:, :, None, :] * mw[None, :, :, None]).reshape(r, 3)
    if clip_edges:
        gf = gf * ((jnp.abs(f) <= CLIP).astype(f.dtype))
    dcw = (gf * rijf).sum(axis=-1, keepdims=True)         # [R,1]
    drij = gf * cw                                        # [R,3]

    # coord MLP backward
    dca = dcw * wc2r_ref[...]                             # [R,1]*[1,H]
    dcpre = dca * _dsilu(cpre)
    dmsg = _mm(dcpre, wc1t_ref[...])                      # [R,H]

    # d tot_m -> per-edge message grad (sum weights)
    dmsg = dmsg + (gtotm_ref[...][:, :, None, :]
                   * mask[None, :, :, None]).reshape(r, h)

    dpre2 = dmsg * _dsilu(pre2)
    da1 = _mm(dpre2, w2t_ref[...])
    dpre1 = da1 * _dsilu(pre1)

    dr2 = _mm(dpre1, wgc_ref[...])                        # [R,1]
    drij = drij + 2.0 * rijf * dr2
    drij4 = drij.reshape(gb, n, n, 3)
    dx_ref[...] = drij4.sum(axis=2) - drij4.sum(axis=1)

    dpre1_4 = dpre1.reshape(gb, n, n, h)
    dhi_ref[...] = dpre1_4.sum(axis=2)
    dhj_ref[...] = dpre1_4.sum(axis=1)
    defea_ref[...] = _mm(dpre1, wet_ref[...]).reshape(gb, n, n, e)

    # weight grads, accumulated across the (sequential) grid
    g = pl.program_id(0)
    updates = (
        (dwg_ref, (r2f * dpre1).sum(axis=0, keepdims=True)),      # [1,H]
        (dwe_ref, _rows_t(efea_ref[...].reshape(r, e), dpre1)),   # [E,H]
        (db1_ref, dpre1.sum(axis=0, keepdims=True)),
        (dw2_ref, _rows_t(a1, dpre2)),                            # [H,H]
        (db2_ref, dpre2.sum(axis=0, keepdims=True)),
        (dwc1_ref, _rows_t(msg, dcpre)),                          # [H,H]
        (dbc1_ref, dcpre.sum(axis=0, keepdims=True)),
        (dwc2_ref, (ca * dcw).sum(axis=0, keepdims=True)),        # [1,H]
        (dbc2_ref, dcw.sum(axis=0, keepdims=True).sum(
            axis=1, keepdims=True)),                              # [1,1]
    )
    for ref, val in updates:
        @pl.when(g == 0)
        def _(ref=ref, val=val):
            ref[...] = val

        @pl.when(g > 0)
        def _(ref=ref, val=val):
            ref[...] = ref[...] + val


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _pad_graphs(arrs, g, gp):
    if g == gp:
        return arrs
    return tuple(jnp.pad(a, [(0, gp - g)] + [(0, 0)] * (a.ndim - 1))
                 for a in arrs)


def _graph_spec(gb, shape_tail):
    return pl.BlockSpec((gb, *shape_tail), lambda i: (i,) + (0,) * len(shape_tail),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _fwd_call(x, hi, hj, efea, mask, weights, *, clip_edges, rows=1600):
    # rows is the [R, H] working-set height per grid step. VMEM cost is
    # dominated by the (8,128)-tile padding of the small-trailing-dim
    # tensors ([R,1], [R,3], [GB,N,N,E]), so the budget is ~rows-linear:
    # 1600 rows ~= 10 MB live at H=64 on v5e (16 MB VMEM).
    g, n, _ = x.shape
    h = hi.shape[-1]
    e = efea.shape[-1]
    gb = _block_graphs(n, rows)
    gp = -(-g // gb) * gb
    x, hi, hj, efea = _pad_graphs((x, hi, hj, efea), g, gp)

    kern = functools.partial(_fwd_kernel, n=n, h=h, e=e, gb=gb,
                             clip_edges=clip_edges)
    totf, totm = pl.pallas_call(
        kern,
        grid=(gp // gb,),
        in_specs=[
            _graph_spec(gb, (n, 3)), _graph_spec(gb, (n, h)),
            _graph_spec(gb, (n, h)), _graph_spec(gb, (n, n, e)),
            _const_spec((n, n)),
            *[_const_spec(w.shape) for w in weights],
        ],
        out_specs=(_graph_spec(gb, (n, 3)), _graph_spec(gb, (n, h))),
        out_shape=(jax.ShapeDtypeStruct((gp, n, 3), x.dtype),
                   jax.ShapeDtypeStruct((gp, n, h), x.dtype)),
        interpret=_interpret(),
    )(x, hi, hj, efea, mask, *weights)
    return totf[:g], totm[:g]


def _bwd_call(x, hi, hj, efea, mask, weights, gtotf, gtotm,
              *, clip_edges, rows=800):
    g, n, _ = x.shape
    h = hi.shape[-1]
    e = efea.shape[-1]
    gb = _block_graphs(n, rows)
    gp = -(-g // gb) * gb
    x, hi, hj, efea, gtotf, gtotm = _pad_graphs(
        (x, hi, hj, efea, gtotf, gtotm), g, gp)

    wg, we, b1, w2, b2, wc1, bc1, wc2, bc2 = weights
    transposed = (wg.T, we.T, w2.T, wc1.T, wc2.T)   # wgc, wet, w2t, wc1t, wc2r

    kern = functools.partial(_bwd_kernel, n=n, h=h, e=e, gb=gb,
                             clip_edges=clip_edges)
    wshapes = [(1, h), (e, h), (1, h), (h, h), (1, h),
               (h, h), (1, h), (1, h), (1, 1)]
    out = pl.pallas_call(
        kern,
        grid=(gp // gb,),
        in_specs=[
            _graph_spec(gb, (n, 3)), _graph_spec(gb, (n, h)),
            _graph_spec(gb, (n, h)), _graph_spec(gb, (n, n, e)),
            _const_spec((n, n)),
            *[_const_spec(w.shape) for w in weights],
            *[_const_spec(w.shape) for w in transposed],
            _graph_spec(gb, (n, 3)), _graph_spec(gb, (n, h)),
        ],
        out_specs=(
            _graph_spec(gb, (n, 3)), _graph_spec(gb, (n, h)),
            _graph_spec(gb, (n, h)), _graph_spec(gb, (n, n, e)),
            *[_const_spec(s) for s in wshapes],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((gp, n, 3), x.dtype),
            jax.ShapeDtypeStruct((gp, n, h), x.dtype),
            jax.ShapeDtypeStruct((gp, n, h), x.dtype),
            jax.ShapeDtypeStruct((gp, n, n, e), x.dtype),
            *[jax.ShapeDtypeStruct(s, x.dtype) for s in wshapes],
        ),
        interpret=_interpret(),
    )(x, hi, hj, efea, mask, *weights, *transposed, gtotf, gtotm)
    dx, dhi, dhj, defea = out[0][:g], out[1][:g], out[2][:g], out[3][:g]
    dw = list(out[4:])
    dw[7] = dw[7].T          # dwc2 accumulated as [1,H]; primal wc2 is [H,1]
    return dx, dhi, dhj, defea, tuple(dw)


# ---------------------------------------------------------------------------
# custom-VJP op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pairwise_message(clip_edges, x, hi, hj, efea, mask, weights):
    """(tot_f, tot_m) of the fused pairwise chain.

    x [G,N,3]; hi/hj [G,N,H] (node features pre-projected by the Wi/Wj
    column slices of the first edge-MLP Linear); efea [G,N,N,E]; mask [N,N]
    0/1 with zero diagonal; weights: 9-tuple in [in,out] layout
    (wg, we, b1, w2, b2, wc1, bc1, wc2, bc2).

    tot_f [G,N,3] = masked_mean_j((x_i-x_j) * coord_scalar) (per-edge
    clipped first iff clip_edges); tot_m [G,N,H] = masked_sum_j(message).
    """
    return _fwd_call(x, hi, hj, efea, mask, weights, clip_edges=clip_edges)


def _pm_fwd(clip_edges, x, hi, hj, efea, mask, weights):
    out = _fwd_call(x, hi, hj, efea, mask, weights, clip_edges=clip_edges)
    return out, (x, hi, hj, efea, mask, weights)


def _pm_bwd(clip_edges, res, cts):
    x, hi, hj, efea, mask, weights = res
    gtotf, gtotm = cts
    dx, dhi, dhj, defea, dweights = _bwd_call(
        x, hi, hj, efea, mask, weights, gtotf, gtotm, clip_edges=clip_edges)
    return dx, dhi, dhj, defea, jnp.zeros_like(mask), tuple(dweights)


pairwise_message.defvjp(_pm_fwd, _pm_bwd)


def supported(n: int, hidden: int, dtype, act, flat: bool, norm: bool,
              tanh: bool = False) -> bool:
    """Config gate: the kernel covers the canonical fp32/SiLU layer shapes
    with one graph block in VMEM; everything else takes the dense path."""
    return (dtype == jnp.float32 and not flat and not norm and not tanh
            and act is jax.nn.silu and n * n <= 4096)
