"""Transposed fully-fused Pallas NeRF kernel: PE + view branch + MLP.

Why a second kernel: the xprof trace (PROFILE_r04.md) shows the original
kernel's *staging* dominates the step — XLA materializes a (n, 64) PE array,
a (n, 128) per-point view bias, and a lane-padded (n, 4)->(n, 128) output in
HBM for every MLP call (~768B/point/direction), while the kernel itself is
~2 ms. TPU layouts pad the minor dimension to 128 lanes, so any per-point
feature array is expensive; the fix is to put the FEATURE dimension on
sublanes and POINTS on lanes:

  input   pv_T (8, n): rows 0-2 = xyz, rows 3-5 = viewdir (32 B/point)
  output  out_T (8, n): rows 0..C-1 = rgb, row C = alpha  (32 B/point)

and compute INSIDE the kernel everything that was staged:
  - positional encoding (L=10 -> 63 rows) by direct sin/cos on VMEM-resident
    (3, tile) vectors — identical values/layout to models/embedder.py;
  - the view-dir encoding (L=4 -> 27 rows) and the per-point view bias
    vpe @ w_pe + b (0.6% extra FLOPs vs staging 512 B/point);
  - the 8x256 trunk + heads as (256,256) @ (256,tile) MXU matmuls
    (transposed weights, packed once outside).

Backward rematerializes the forward per tile (no activation stashing in
HBM), accumulates transposed weight grads across sequential grid steps, and
chains d/d(pe) through the sin/cos back to d/d(xyz) and d/d(viewdir)
in-kernel, so the only backward staging is the (8, n) dpv cotangent.

Replaces: reference embedder (model/embedder.py:4-52) + NeRF forward
(model/nerf.py:67-116) + their autograd. Numerics match the jnp path at
fp32 rounding (kernel-vs-jnp tests in tests/test_pallas_t.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024        # points per fwd grid step (lanes)
BWD_TILE = 768     # backward rematerializes 8 (256, tile) activations;
                   # 768 won the r5 on-chip sweep (tools/tpu_session_r05c:
                   # 140.4k rays/s vs 136.0k at 512, re-verified after the
                   # lcm-padding fix in tpu_session_r05d's preamble)
INTERPRET = False
# True: weights packed in natural (fan_in, fan_out) orientation, kernel
# contracts over dim 0 (no packing transposes). False: weights pre-transposed
# to (fan_out, fan_in) as in the original r4 kernel — the round-4 bench
# measured that variant fastest (133.6k vs 130.7k rays/s, PROFILE_r04.md) but
# it was shipped off on a structural argument; both are kept measurable
# (VERDICT r4 weak #2) and numerically identical (test_pallas_t).
# On the merged 2-call step the question re-measured in natural's favor:
# 136.0k vs 135.1k rays/s (tools/tpu_session_r05b.py P1).
NATURAL_WEIGHTS = True
# Forward grid steps are independent (disjoint out tiles, constant weights):
# "parallel" lets Mosaic pipeline them. Backward stays "arbitrary" (weight
# grads accumulate across steps).
FWD_PARALLEL = True

WIDTH = 256
DEPTH = 8
SKIP_LAYER = 5
L_PTS = 10
L_VIEWS = 4
PE_PAD = 64        # 63 PE rows padded
VPE_PAD = 32       # 27 view-PE rows padded
HEAD = 128
IN_ROWS = 8        # pv_T sublane count


def supports(params, pts) -> bool:
    """Standard BeNeRF architecture (same predicate as pallas_mlp minus the
    staging-era constraints)."""
    try:
        if "views" not in params or len(params["pts"]) != DEPTH:
            return False
        if params["pts"][0]["w"].shape != (63, WIDTH):
            return False
        if "w_pe" not in params["pts"][SKIP_LAYER]:
            return False
        if params["views"]["w_feat"].shape != (WIDTH, HEAD):
            return False
        if params["views"]["w_pe"].shape != (27, HEAD):
            return False
        channels = params["rgb"]["w"].shape[1]
        if channels + 1 > IN_ROWS:
            return False
        return True
    except Exception:
        return False


def pack_params_t(params):
    """-> tuple of MXU/sublane-aligned arrays (differentiable).

    Weights stay in their NATURAL (fan_in, fan_out) orientation — the
    kernel contracts over dim 0 (dot_general handles either side on the
    MXU), so packing is pads/stacks only. Pre-transposing here made XLA
    insert a per-call layout copy of every weight matrix inside the scan
    body (the dominant residual in the r04b trace)."""
    p = params
    w0 = jnp.pad(p["pts"][0]["w"], ((0, PE_PAD - 63), (0, 0)))  # (64,256)
    w5pe = jnp.pad(
        p["pts"][SKIP_LAYER]["w_pe"], ((0, PE_PAD - 63), (0, 0))
    )  # (64,256)
    wh = jnp.stack(
        [
            p["pts"][l]["w_h"] if l == SKIP_LAYER else p["pts"][l]["w"]
            for l in range(1, DEPTH)
        ]
    )  # (7,256,256) each (in,out)
    b = jnp.stack(
        [p["pts"][l]["b"] for l in range(DEPTH)]
    )[..., None]  # (8,256,1)

    C = p["rgb"]["w"].shape[1]
    # head space: columns map to output rows 0..C-1 rgb, C alpha
    wa = jnp.zeros((WIDTH, HEAD)).at[:, C : C + 1].set(p["alpha"]["w"])
    wf = p["feature"]["w"]                     # (256,256)
    bf = p["feature"]["b"][:, None]            # (256,1)
    wfv = p["views"]["w_feat"]                 # (256,128)
    wvpe = jnp.pad(p["views"]["w_pe"], ((0, VPE_PAD - 27), (0, 0)))
    bv = p["views"]["b"][:, None]              # (128,1)
    wrgb = jnp.zeros((HEAD, HEAD)).at[:, :C].set(p["rgb"]["w"])
    hb = (
        jnp.zeros((HEAD, 1))
        .at[:C, 0].set(p["rgb"]["b"])
        .at[C, 0].set(p["alpha"]["b"][0])
    )
    ws = (w0, wh, w5pe, b, wa, wf, bf, wfv, wvpe, bv, wrgb, hb)
    if NATURAL_WEIGHTS:
        return ws
    # NATURAL_WEIGHTS=False: pre-transpose every weight matrix to
    # (fan_out, fan_in) — the r4-measured-fastest layout (PROFILE_r04.md
    # outcome table); biases stay column vectors. Kept measurable so perf
    # rounds can re-decide on evidence (VERDICT r4 weak #2).
    idx_bias = {3, 6, 9, 11}  # b, bf, bv, hb positions in ws

    def t(x):
        return jnp.swapaxes(x, -1, -2)

    return tuple(
        w if i in idx_bias else t(w) for i, w in enumerate(ws)
    )


def band_row_weights(weights, L, n_dims=3, pad=None):
    """(L,) per-frequency weights -> (pad, 1) PE row multipliers.

    Row layout follows _encode_T: [identity x3, (sin,cos) x3 per freq].
    Identity rows weigh 1; padding rows 0. weights=None -> all-ones (the
    kernel multiplies unconditionally so BARF on/off shares one graph).
    """
    C_rows = n_dims * (2 * L + 1)
    pad = pad or C_rows
    if weights is None:
        w = jnp.ones((C_rows,))
    else:
        w = jnp.concatenate(
            [jnp.ones((n_dims,)),
             jnp.repeat(jnp.asarray(weights), 2 * n_dims)]
        )
    return jnp.pad(w, (0, pad - C_rows))[:, None]


def _encode_T(x3, L):
    """(3, T) -> (3*(2L+1), T) positional encoding, embedder row order
    [x, sin(f0 x), cos(f0 x), sin(f1 x), ...] with fk = 2**k."""
    rows = [x3]
    for k in range(L):
        b = x3 * (2.0 ** k)
        rows.append(jnp.sin(b))
        rows.append(jnp.cos(b))
    return jnp.concatenate(rows, axis=0)


def _encode_bwd_T(x3, d_enc, L):
    """VJP of _encode_T: d_enc (3*(2L+1), T) -> dx (3, T)."""
    dx = d_enc[0:3]
    for k in range(L):
        f = 2.0 ** k
        b = x3 * f
        ds = d_enc[3 + 6 * k : 6 + 6 * k]
        dc = d_enc[6 + 6 * k : 9 + 6 * k]
        dx = dx + f * (jnp.cos(b) * ds - jnp.sin(b) * dc)
    return dx


def _trunk_forward_t(pv, pw, vw, w0, wh, w5pe, b, wa, wf, bf, wfv, wvpe, bv,
                     wrgb, hb, dtype, keep):
    """Shared fwd math on one (8, T) tile, everything transposed.

    pw (PE_PAD,1) / vw (VPE_PAD,1): per-row encoding multipliers (BARF
    coarse-to-fine band weights; all-ones when BARF is off)."""
    precision = (jax.lax.Precision.HIGHEST if dtype == "float32_highest"
                 else jax.lax.Precision.DEFAULT)
    if dtype == "float32_highest":
        dtype = jnp.float32

    def mm(w, a):  # -> (O, T), f32 accumulation. w natural (I, O) or
        # pre-transposed (O, I) per NATURAL_WEIGHTS
        dn = ((((0,), (0,)) if NATURAL_WEIGHTS else ((1,), (0,))), ((), ()))
        return jax.lax.dot_general(
            w.astype(dtype), a.astype(dtype),
            dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision,
        )

    store = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    T = pv.shape[1]
    xyz = pv[0:3]
    vd = pv[3:6]
    pe = _encode_T(xyz, L_PTS)                       # (63, T)
    pe = jnp.concatenate([pe, jnp.zeros((PE_PAD - 63, T), pe.dtype)], axis=0)
    pe = pe * pw
    vpe = _encode_T(vd, L_VIEWS)                     # (27, T)
    vpe = jnp.concatenate(
        [vpe, jnp.zeros((VPE_PAD - 27, T), vpe.dtype)], axis=0
    )
    vpe = vpe * vw

    acts = [] if keep else None
    h = jnp.maximum(mm(w0, pe) + b[0], 0.0)          # (256, T)
    if keep:
        acts.append(h.astype(store))
    for l in range(1, DEPTH):
        t = mm(wh[l - 1], h) + b[l]
        if l == SKIP_LAYER:
            t = t + mm(w5pe, pe)
        h = jnp.maximum(t, 0.0)
        if keep:
            acts.append(h.astype(store))
    av = mm(wa, h) + hb                              # (128, T)
    f = mm(wf, h) + bf                               # (256, T)
    vb = mm(wvpe, vpe) + bv                          # (128, T)
    hv = jnp.maximum(mm(wfv, f) + vb, 0.0)           # (128, T)
    rv = mm(wrgb, hv) + hb                           # (128, T)
    row = jax.lax.broadcasted_iota(jnp.int32, av.shape, 0)
    return pe, vpe, av, f, hv, rv, row, acts, mm


def _fwd_kernel_t(C, dtype, pv_ref, *refs):
    (w0_ref, wh_ref, w5pe_ref, b_ref, wa_ref, wf_ref, bf_ref, wfv_ref,
     wvpe_ref, bv_ref, wrgb_ref, hb_ref, pw_ref, vw_ref, out_ref) = refs
    pv = pv_ref[:]
    _, _, av, _, _, rv, row, _, _ = _trunk_forward_t(
        pv, pw_ref[:], vw_ref[:], w0_ref[:], wh_ref[:], w5pe_ref[:],
        b_ref[:], wa_ref[:], wf_ref[:], bf_ref[:], wfv_ref[:], wvpe_ref[:],
        bv_ref[:], wrgb_ref[:], hb_ref[:], dtype, keep=False,
    )
    combined = jnp.where(row < C, rv, 0.0) + jnp.where(row == C, av, 0.0)
    out_ref[:] = combined[:IN_ROWS]


def _bwd_kernel_t(C, dtype, pv_ref, *refs):
    (w0_ref, wh_ref, w5pe_ref, b_ref, wa_ref, wf_ref, bf_ref, wfv_ref,
     wvpe_ref, bv_ref, wrgb_ref, hb_ref, pw_ref, vw_ref, g_ref,
     dpv_ref, dw0_ref, dwh_ref, dw5pe_ref, db_ref, dwa_ref, dwf_ref,
     dbf_ref, dwfv_ref, dwvpe_ref, dbv_ref, dwrgb_ref, dhb_ref,
     dpw_ref, dvw_ref) = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dw0_ref, dwh_ref, dw5pe_ref, db_ref, dwa_ref, dwf_ref,
                  dbf_ref, dwfv_ref, dwvpe_ref, dbv_ref, dwrgb_ref, dhb_ref,
                  dpw_ref, dvw_ref):
            # dpw/dvw stay zero: the band weights are step functions of the
            # iteration counter, not trainables
            r[:] = jnp.zeros_like(r)

    pv = pv_ref[:]
    pw, vw = pw_ref[:], vw_ref[:]
    w0, wh, w5pe = w0_ref[:], wh_ref[:], w5pe_ref[:]
    wa, wf, wfv = wa_ref[:], wf_ref[:], wfv_ref[:]
    wvpe, wrgb = wvpe_ref[:], wrgb_ref[:]
    pe, vpe, av, f, hv, rv, row, acts, mm = _trunk_forward_t(
        pv, pw, vw, w0, wh, w5pe, b_ref[:], wa, wf, bf_ref[:], wfv, wvpe,
        bv_ref[:], wrgb, hb_ref[:], dtype, keep=True,
    )
    T = pv.shape[1]

    precision = (jax.lax.Precision.HIGHEST if dtype == "float32_highest"
                 else jax.lax.Precision.DEFAULT)
    cdt = jnp.float32 if dtype == "float32_highest" else dtype

    def mm_tn(w, g):  # (I, T): transposed apply of w to g (O, T)
        dn = ((((1,), (0,)) if NATURAL_WEIGHTS else ((0,), (0,))), ((), ()))
        return jax.lax.dot_general(
            w.astype(cdt), g.astype(cdt),
            dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision,
        )

    def outer(a, g):  # dW in the packed orientation: natural (I, O) =
        # a (I, T) @ g (O, T)^T; pre-transposed (O, I) = g @ a^T
        lhs, rhs = (a, g) if NATURAL_WEIGHTS else (g, a)
        return jax.lax.dot_general(
            lhs.astype(cdt), rhs.astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    g_small = g_ref[:]                                     # (8, T)
    g_full = jnp.concatenate(
        [g_small, jnp.zeros((HEAD - IN_ROWS, T), jnp.float32)], axis=0
    )
    g_rgb = jnp.where(row < C, g_full, 0.0)
    g_alpha = jnp.where(row == C, g_full, 0.0)

    # rgb head
    dhv = mm_tn(wrgb, g_rgb)
    dwrgb_ref[:] += outer(hv, g_rgb)
    # views layer
    dhv_pre = dhv * (hv > 0)
    df = mm_tn(wfv, dhv_pre)
    dwfv_ref[:] += outer(f, dhv_pre)
    # view bias branch
    dvb = dhv_pre                                          # (128, T)
    dwvpe_ref[:] += outer(vpe, dvb)
    dbv_ref[:] += jnp.sum(dvb, axis=1, keepdims=True)
    dvpe = mm_tn(wvpe, dvb)                                # (32, T)
    # feature + alpha heads
    dh = mm_tn(wf, df) + mm_tn(wa, g_alpha)
    h7 = acts[DEPTH - 1]
    dwf_ref[:] += outer(h7, df)
    dbf_ref[:] += jnp.sum(df, axis=1, keepdims=True)
    dwa_ref[:] += outer(h7, g_alpha)
    dhb_ref[:] += jnp.sum(g_alpha + g_rgb, axis=1, keepdims=True)

    # trunk backward
    dpe = jnp.zeros((PE_PAD, T), jnp.float32)
    for l in range(DEPTH - 1, -1, -1):
        dpre = dh * (acts[l].astype(jnp.float32) > 0)
        db_ref[l] += jnp.sum(dpre, axis=1, keepdims=True)
        if l == 0:
            dw0_ref[:] += outer(pe, dpre)
            dpe = dpe + mm_tn(w0, dpre)
        else:
            dwh_ref[l - 1] += outer(acts[l - 1], dpre)
            dh = mm_tn(wh[l - 1], dpre)
            if l == SKIP_LAYER:
                dw5pe_ref[:] += outer(pe, dpre)
                dpe = dpe + mm_tn(w5pe, dpre)

    # through the encodings back to xyz / viewdir rows (pe/vpe consumed by
    # the matmuls are the band-weighted versions: chain the row weights in)
    dxyz = _encode_bwd_T(pv[0:3], (dpe * pw)[:63], L_PTS)
    dvd = _encode_bwd_T(pv[3:6], (dvpe * vw)[:27], L_VIEWS)
    dpv_ref[:] = jnp.concatenate(
        [dxyz, dvd, jnp.zeros((IN_ROWS - 6, T), jnp.float32)], axis=0
    )


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _fwd_call(pv, packed, C, dtype):
    n = pv.shape[1]
    assert n % TILE == 0, (n, TILE)
    grid = n // TILE
    w_specs = [_const_spec(w.shape) for w in packed]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_t, C, dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((IN_ROWS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((IN_ROWS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((IN_ROWS, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel",) if FWD_PARALLEL else ("arbitrary",)
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * WIDTH * (PE_PAD + 6 * WIDTH + WIDTH + 2 * HEAD)
            + 2 * n * HEAD * HEAD,
            bytes_accessed=n * 2 * IN_ROWS * 4,
            transcendentals=n * (2 * 3 * (L_PTS + L_VIEWS)),
        ),
        interpret=INTERPRET,
    )(pv, *packed)


def _bwd_call(pv, packed, g, C, dtype):
    n = pv.shape[1]
    # a non-dividing tile would silently drop the tail's gradients
    assert n % BWD_TILE == 0, (n, BWD_TILE)
    grid = n // BWD_TILE
    w_specs = [_const_spec(w.shape) for w in packed]
    out_shapes = (
        jax.ShapeDtypeStruct(pv.shape, jnp.float32),    # dpv
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed],
    )
    out_specs = (
        pl.BlockSpec((IN_ROWS, BWD_TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        *[_const_spec(w.shape) for w in packed],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel_t, C, dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((IN_ROWS, BWD_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *w_specs,
            pl.BlockSpec((IN_ROWS, BWD_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=INTERPRET,
    )(pv, *packed, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _core(pv, packed, C, dtype_name):
    return _fwd_call(pv, packed, C, _resolve(dtype_name))


def _resolve(dtype_name):
    if dtype_name == "bfloat16":
        return jnp.bfloat16
    if dtype_name == "float32_highest":
        return "float32_highest"
    return jnp.float32


def _core_fwd(pv, packed, C, dtype_name):
    return _core(pv, packed, C, dtype_name), (pv, packed)


def _core_bwd(C, dtype_name, res, g):
    pv, packed = res
    outs = _bwd_call(pv, packed, g, C, _resolve(dtype_name))
    return outs[0], tuple(outs[1:])


_core.defvjp(_core_fwd, _core_bwd)


def fused_nerf_mlp(params, pts, viewdirs, *, num_freqs=10, num_freqs_views=4,
                   compute_dtype="float32", barf_weights=None,
                   barf_weights_views=None):
    """Drop-in replacement for models.nerf.apply (standard architecture,
    viewdirs on; optional BARF band weights). pts: (R, S, 3);
    viewdirs: (R, 3)."""
    assert num_freqs == L_PTS and num_freqs_views == L_VIEWS
    R, S, _ = pts.shape
    C = params["rgb"]["w"].shape[1]
    n = R * S

    # (8, n): rows 0-2 points, 3-5 per-point viewdirs. XLA fuses this
    # producer into one wide (8, n) materialization — the kernel's only
    # streamed input.
    pts_T = pts.reshape(n, 3).T
    vd_T = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(n, 3).T
    pv = jnp.concatenate(
        [pts_T, vd_T, jnp.zeros((IN_ROWS - 6, n), pts.dtype)], axis=0
    )
    # pad so BOTH grids divide exactly: a BWD_TILE that does not divide the
    # fwd-padded n would silently drop the tail from the backward pass
    import math as _math

    block = _math.lcm(TILE, BWD_TILE)
    n_pad = (-n) % block
    if n_pad:
        pv = jnp.pad(pv, ((0, 0), (0, n_pad)))

    pw = band_row_weights(barf_weights, L_PTS, pad=PE_PAD)
    vw = band_row_weights(barf_weights_views, L_VIEWS, pad=VPE_PAD)
    packed = pack_params_t(params) + (pw, vw)
    out_T = _core(pv, packed, C, compute_dtype)      # (8, n_padded)
    return out_T[: C + 1, :n].T.reshape(R, S, C + 1)
