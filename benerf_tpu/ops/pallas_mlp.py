"""Fused Pallas TPU kernels for the NeRF MLP hot loop.

Why: per training iteration ~390k sample points run through the 8x256 MLP
(SURVEY.md §3.1). In the plain XLA path every layer's activation
(N x 256 x 4B ~ 400 MB) round-trips through HBM — the step is
bandwidth-bound. These kernels keep the whole trunk resident in VMEM: per
grid step only the 64-channel encoded input tile, the per-ray view bias and
the 4-channel output move, with all weights pinned in VMEM across steps
(constant index_map). The backward kernel rematerializes the forward inside
the tile (no activation stashing in HBM) and accumulates weight gradients
across grid steps in revisited output blocks — the standard sequential-grid
accumulation pattern.

Layout ("head space"): the alpha/rgb heads are padded into a 128-lane space
where columns 0..C-1 carry rgb and column C carries alpha (C = channels), so
masking replaces lane shuffles. The skip layer is consumed as the split
(w_pe, w_h) pair from models/nerf.py — no 319-wide concat ever exists.

Replaces: reference MLP forward model/nerf.py:94-110 (+ its autograd).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benerf_tpu.models import embedder

TILE = 512         # points per grid step; S must divide TILE
BWD_TILE = 256     # backward rematerializes 8 activations per tile; 512
                   # overflows the 16MB VMEM budget by ~2KB on v5e
# bfloat16 mode stores the PE/view-bias HBM tiles and the rematerialized
# trunk activations in bf16: half the streamed bytes and half the stashed
# VMEM, so both tiles double.
TILE_BF16 = 1024
BWD_TILE_BF16 = 512
INTERPRET = False  # set True (tests) to run kernels in interpreter mode
IN_PAD = 64        # 63-channel PE padded to 64 lanes
HEAD = 128         # head-space lanes
WIDTH = 256
DEPTH = 8
SKIP_LAYER = 5     # trunk layer index consuming (pe, h) split weights


def supports(params, pts) -> bool:
    """Structural predicate: standard BeNeRF architecture.

    No constraint on S: the kernel is pointwise (the per-ray view bias is
    expanded per point before the call), points are flattened to (R*S) and
    padded to the tile size. An earlier TILE % S == 0 requirement (vestige
    of a per-ray vb block layout) silently routed the FINE pass — S = 192,
    two thirds of the step FLOPs — to the bandwidth-bound jnp fallback.
    """
    try:
        if "views" not in params or len(params["pts"]) != DEPTH:
            return False
        if params["pts"][0]["w"].shape != (63, WIDTH):
            return False
        if "w_pe" not in params["pts"][SKIP_LAYER]:
            return False
        if params["views"]["w_feat"].shape != (WIDTH, HEAD):
            return False
        channels = params["rgb"]["w"].shape[1]
        if channels + 1 > HEAD:
            return False
        return True
    except Exception:
        return False


# --------------------------------------------------------------------------
# parameter packing (differentiable jnp ops OUTSIDE the custom_vjp boundary)
# --------------------------------------------------------------------------


def pack_params(params):
    """-> tuple of MXU-aligned arrays; grads flow back through the padding."""
    p = params
    w0 = jnp.pad(p["pts"][0]["w"], ((0, IN_PAD - 63), (0, 0)))
    w5pe = jnp.pad(p["pts"][SKIP_LAYER]["w_pe"], ((0, IN_PAD - 63), (0, 0)))
    wh = jnp.stack(
        [
            p["pts"][l]["w_h"] if l == SKIP_LAYER else p["pts"][l]["w"]
            for l in range(1, DEPTH)
        ]
    )  # (7, 256, 256)
    b = jnp.stack([p["pts"][l]["b"] for l in range(DEPTH)])  # (8, 256)

    C = p["rgb"]["w"].shape[1]
    wa = jnp.zeros((WIDTH, HEAD)).at[:, C : C + 1].set(p["alpha"]["w"])
    wf = p["feature"]["w"]
    bf = p["feature"]["b"][None, :]
    wfv = p["views"]["w_feat"]  # (256, 128)
    wrgb = jnp.zeros((HEAD, HEAD)).at[:, :C].set(p["rgb"]["w"])
    hb = (
        jnp.zeros((1, HEAD))
        .at[0, :C].set(p["rgb"]["b"])
        .at[0, C].set(p["alpha"]["b"][0])
    )
    return (w0, wh, w5pe, b, wa, wf, bf, wfv, wrgb, hb)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _trunk_forward(pe, vb_exp, w0, wh, w5pe, b, wa, wf, bf, wfv, wrgb, hb,
                   dtype, keep_acts: bool):
    """Shared fwd math on one tile. Returns (combined_headspace, acts|None)."""

    # DEFAULT matches the pure-jnp fallback (precision=None): one bf16 MXU
    # pass with f32 accumulation. "float32_highest" opts into the exact
    # 6-pass f32 algorithm for debugging at ~6x matmul cost.
    precision = (jax.lax.Precision.HIGHEST if dtype == "float32_highest"
                 else jax.lax.Precision.DEFAULT)
    if dtype == "float32_highest":
        dtype = jnp.float32

    def mm(a, w):
        return jnp.dot(a.astype(dtype), w.astype(dtype),
                       preferred_element_type=jnp.float32,
                       precision=precision)

    # bf16 mode stashes the rematerialized activations in bf16 — they feed
    # straight back into bf16 MXU passes, and halving them is what lets the
    # backward tile double (BWD_TILE_BF16)
    store = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    acts = [] if keep_acts else None
    h = jnp.maximum(mm(pe, w0) + b[0], 0.0)
    if keep_acts:
        acts.append(h.astype(store))
    for l in range(1, DEPTH):
        t = mm(h, wh[l - 1]) + b[l]
        if l == SKIP_LAYER:
            t = t + mm(pe, w5pe)
        h = jnp.maximum(t, 0.0)
        if keep_acts:
            acts.append(h.astype(store))
    av = mm(h, wa) + hb          # (T,128) col C = alpha (+ rgb-bias junk cols)
    f = mm(h, wf) + bf           # (T,256)
    hv = jnp.maximum(mm(f, wfv) + vb_exp, 0.0)  # (T,128)
    rv = mm(hv, wrgb) + hb       # (T,128) cols<C = rgb
    col = jax.lax.broadcasted_iota(jnp.int32, av.shape, 1)
    return av, f, hv, rv, col, acts


def _fwd_kernel(S, C, dtype, pe_ref, vb_ref, w0_ref, wh_ref, w5pe_ref, b_ref,
                wa_ref, wf_ref, bf_ref, wfv_ref, wrgb_ref, hb_ref, out_ref):
    # vb arrives pre-expanded per point (Mosaic requires >=8 sublanes per
    # block; a per-ray (TILE//S, 128) block violates that when S > TILE//8,
    # and the kernel is compute-bound so the extra read is free).
    av, f, hv, rv, col, _ = _trunk_forward(
        pe_ref[:], vb_ref[:], w0_ref[:], wh_ref[:], w5pe_ref[:], b_ref[:],
        wa_ref[:], wf_ref[:], bf_ref[:], wfv_ref[:], wrgb_ref[:], hb_ref[:],
        dtype, keep_acts=False,
    )
    combined = jnp.where(col < C, rv, 0.0) + jnp.where(col == C, av, 0.0)
    out_ref[:] = combined[:, : C + 1]


# --------------------------------------------------------------------------
# backward kernel (rematerialized)
# --------------------------------------------------------------------------


def _bwd_kernel(S, C, dtype, pe_ref, vb_ref, w0_ref, wh_ref, w5pe_ref, b_ref,
                wa_ref, wf_ref, bf_ref, wfv_ref, wrgb_ref, hb_ref, g_ref,
                dpe_ref, dvb_ref, dw0_ref, dwh_ref, dw5pe_ref, db_ref,
                dwa_ref, dwf_ref, dbf_ref, dwfv_ref, dwrgb_ref, dhb_ref):
    T = pe_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dw5pe_ref[:] = jnp.zeros_like(dw5pe_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dwf_ref[:] = jnp.zeros_like(dwf_ref)
        dbf_ref[:] = jnp.zeros_like(dbf_ref)
        dwfv_ref[:] = jnp.zeros_like(dwfv_ref)
        dwrgb_ref[:] = jnp.zeros_like(dwrgb_ref)
        dhb_ref[:] = jnp.zeros_like(dhb_ref)

    # DEFAULT matches the pure-jnp fallback (precision=None): one bf16 MXU
    # pass with f32 accumulation. "float32_highest" opts into the exact
    # 6-pass f32 algorithm for debugging at ~6x matmul cost.
    precision = (jax.lax.Precision.HIGHEST if dtype == "float32_highest"
                 else jax.lax.Precision.DEFAULT)
    if dtype == "float32_highest":
        dtype = jnp.float32

    def mm_nt(a, w):  # a @ w.T
        return jax.lax.dot_general(
            a.astype(dtype), w.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    def mm_tn(a, g):  # a.T @ g
        return jax.lax.dot_general(
            a.astype(dtype), g.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    pe = pe_ref[:]

    av, f, hv, rv, col, acts = _trunk_forward(
        pe, vb_ref[:], w0_ref[:], wh_ref[:], w5pe_ref[:], b_ref[:], wa_ref[:],
        wf_ref[:], bf_ref[:], wfv_ref[:], wrgb_ref[:], hb_ref[:], dtype,
        keep_acts=True,
    )
    h7 = acts[DEPTH - 1]

    # pad cotangent (T, C+1) into head space
    g_small = g_ref[:]
    g_full = jnp.concatenate(
        [g_small, jnp.zeros((T, HEAD - (C + 1)), jnp.float32)], axis=1
    )
    g_rgb = jnp.where(col < C, g_full, 0.0)
    g_alpha = jnp.where(col == C, g_full, 0.0)

    # rgb head
    dhv = mm_nt(g_rgb, wrgb_ref[:])
    dwrgb_ref[:] += mm_tn(hv, g_rgb)
    # views layer
    dhv_pre = dhv * (hv > 0)
    dvb_ref[:] = dhv_pre.astype(dvb_ref.dtype)  # per-point; per-ray sum
    # happens via the outer broadcast's autodiff in fused_nerf_mlp
    df = mm_nt(dhv_pre, wfv_ref[:])
    dwfv_ref[:] += mm_tn(f, dhv_pre)
    # feature + alpha heads
    dh = mm_nt(df, wf_ref[:]) + mm_nt(g_alpha, wa_ref[:])
    dwf_ref[:] += mm_tn(h7, df)
    dbf_ref[:] += jnp.sum(df, axis=0, keepdims=True)
    dwa_ref[:] += mm_tn(h7, g_alpha)
    dhb_ref[:] += jnp.sum(g_alpha + g_rgb, axis=0, keepdims=True)

    # trunk backward
    dpe = jnp.zeros((T, IN_PAD), jnp.float32)
    for l in range(DEPTH - 1, -1, -1):
        # ReLU mask in f32: this TPU target's Mosaic rejects arith.cmpf on
        # bf16 vectors ("Target does not support this comparison")
        dpre = dh * (acts[l].astype(jnp.float32) > 0)
        db_ref[l, :] += jnp.sum(dpre, axis=0)
        prev = pe if l == 0 else acts[l - 1]
        if l == 0:
            dw0_ref[:] += mm_tn(pe, dpre)
            dpe = dpe + mm_nt(dpre, w0_ref[:])
        else:
            dwh_ref[l - 1] += mm_tn(prev, dpre)
            dh = mm_nt(dpre, wh_ref[l - 1])
            if l == SKIP_LAYER:
                dw5pe_ref[:] += mm_tn(pe, dpre)
                dpe = dpe + mm_nt(dpre, w5pe_ref[:])
    dpe_ref[:] = dpe.astype(dpe_ref.dtype)


# --------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# --------------------------------------------------------------------------


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _tiles(dtype_name: str):
    if dtype_name == "bfloat16":
        return TILE_BF16, BWD_TILE_BF16
    return TILE, BWD_TILE


def _fwd_call(pe, vb, packed, S: int, C: int, dtype, tile: int):
    n = pe.shape[0]
    grid = n // tile
    w_specs = [_const_spec(w.shape) for w in packed]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, S, C, dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, HEAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile, C + 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, C + 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * WIDTH * (IN_PAD + 6 * WIDTH + WIDTH + 2 * HEAD)
            + 2 * n * HEAD * HEAD,
            bytes_accessed=n * (IN_PAD + HEAD + C + 1) * 4,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(pe, vb, *packed)


def _bwd_call(pe, vb, packed, g, S: int, C: int, dtype, bwd_tile: int):
    n = pe.shape[0]
    grid = n // bwd_tile
    w_specs = [_const_spec(w.shape) for w in packed]
    out_shapes = (
        # cotangents must match the primal dtypes (bf16 staging mode)
        jax.ShapeDtypeStruct(pe.shape, pe.dtype),       # dpe
        jax.ShapeDtypeStruct(vb.shape, vb.dtype),       # dvb (per point)
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed],
    )
    out_specs = (
        pl.BlockSpec((bwd_tile, IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bwd_tile, HEAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        *[_const_spec(w.shape) for w in packed],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, S, C, dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bwd_tile, IN_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bwd_tile, HEAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
            pl.BlockSpec((bwd_tile, C + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=INTERPRET,
    )(pe, vb, *packed, g)


def _resolve_dtype(dtype_name):
    if dtype_name == "bfloat16":
        return jnp.bfloat16
    if dtype_name == "float32_highest":
        return "float32_highest"
    return jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _core(pe, vb, packed, S, C, dtype_name):
    fwd_tile, _ = _tiles(dtype_name)
    return _fwd_call(pe, vb, packed, S, C, _resolve_dtype(dtype_name),
                     fwd_tile)


def _core_fwd(pe, vb, packed, S, C, dtype_name):
    return _core(pe, vb, packed, S, C, dtype_name), (pe, vb, packed)


def _core_bwd(S, C, dtype_name, res, g):
    pe, vb, packed = res
    _, bwd_tile = _tiles(dtype_name)
    outs = _bwd_call(pe, vb, packed, g, S, C, _resolve_dtype(dtype_name),
                     bwd_tile)
    dpe, dvb = outs[0], outs[1]
    dpacked = tuple(outs[2:])
    return dpe, dvb, dpacked


_core.defvjp(_core_fwd, _core_bwd)


def fused_nerf_mlp(params, pts, viewdirs, *, num_freqs=10, num_freqs_views=4,
                   compute_dtype="float32"):
    """Drop-in replacement for models.nerf.apply on the standard
    architecture (viewdirs on, no BARF). pts: (R, S, 3); viewdirs: (R, 3)."""
    R, S, _ = pts.shape
    C = params["rgb"]["w"].shape[1]
    n = R * S

    # per-ray view bias: vpe @ Wv + b (jnp — tiny, differentiable). Expanded
    # to per-point before the kernel: Mosaic blocks need >=8 sublanes, and
    # the broadcast's autodiff gives the per-ray dvb sum for free.
    vpe = embedder.positional_encoding(viewdirs, num_freqs_views)
    vb = vpe @ params["views"]["w_pe"] + params["views"]["b"]  # (R, HEAD)
    vb = jnp.broadcast_to(vb[:, None, :], (R, S, HEAD)).reshape(n, HEAD)

    pe = embedder.positional_encoding(pts.reshape(n, 3), num_freqs)
    pe = jnp.pad(pe, ((0, 0), (0, IN_PAD - 63)))

    # backward tiles are the finer granularity; pad to the coarser fwd tile
    # (bwd tile always divides it)
    fwd_tile, _ = _tiles(compute_dtype)
    n_pad = (-n) % fwd_tile
    if n_pad:
        pe = jnp.pad(pe, ((0, n_pad), (0, 0)))
        vb = jnp.pad(vb, ((0, n_pad), (0, 0)))

    if compute_dtype == "bfloat16":
        # bf16 HBM staging: the pe/vb tiles are the kernel's only streamed
        # inputs — halving them halves the kernel's HBM traffic. The MXU
        # consumes bf16 either way (Precision.DEFAULT); accumulation stays
        # f32 and the cast's VJP upcasts dpe/dvb back to f32.
        pe = pe.astype(jnp.bfloat16)
        vb = vb.astype(jnp.bfloat16)

    packed = pack_params(params)
    raw = _core(pe, vb, packed, S, C, compute_dtype)
    return raw[:n].reshape(R, S, C + 1)
