"""Transposed fully-fused Pallas kernel (PE + view branch + MLP in-kernel)
vs the pure-jnp path — interpreter mode on CPU; compiles on TPU (bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benerf_tpu.models import nerf as nerf_mod
from benerf_tpu.ops import pallas_mlp_t


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_mlp_t.INTERPRET = True
    yield
    pallas_mlp_t.INTERPRET = False


def _inputs(R=16, S=64, channels=3, seed=0):
    params = nerf_mod.init_params(jax.random.PRNGKey(seed), channels=channels)
    pts = jax.random.normal(jax.random.PRNGKey(seed + 1), (R, S, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(seed + 2), (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return params, pts, dirs


def test_supports_predicate():
    params, pts, _ = _inputs()
    assert pallas_mlp_t.supports(params, pts)
    no_views = {k: v for k, v in params.items() if k != "views"}
    assert not pallas_mlp_t.supports(no_views, pts)


@pytest.mark.parametrize("channels", [3, 1])
@pytest.mark.parametrize("S", [64, 128, 192])
def test_forward_matches_jnp(channels, S):
    params, pts, dirs = _inputs(R=7, S=S, channels=channels)
    out_t = pallas_mlp_t.fused_nerf_mlp(params, pts, dirs)
    out_j = nerf_mod.apply(params, pts, dirs)
    assert out_t.shape == out_j.shape == (7, S, channels + 1)
    assert np.allclose(out_t, out_j, atol=2e-4), (
        np.abs(np.asarray(out_t) - np.asarray(out_j)).max()
    )


def test_gradients_match_jnp():
    params, pts, dirs = _inputs(R=8)

    def loss_t(p, x, d):
        return jnp.sum(jnp.sin(pallas_mlp_t.fused_nerf_mlp(p, x, d)))

    def loss_j(p, x, d):
        return jnp.sum(jnp.sin(nerf_mod.apply(p, x, d)))

    gt = jax.grad(loss_t, argnums=(0, 1, 2))(params, pts, dirs)
    gj = jax.grad(loss_j, argnums=(0, 1, 2))(params, pts, dirs)
    for a, b in zip(jax.tree.leaves(gt), jax.tree.leaves(gj)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        assert np.allclose(a, b, atol=5e-4 * max(scale, 1.0)), (
            f"grad mismatch: {np.abs(np.asarray(a) - np.asarray(b)).max()} "
            f"vs scale {scale}"
        )


def test_bfloat16_mode():
    params, pts, dirs = _inputs(R=8)
    out_f32 = pallas_mlp_t.fused_nerf_mlp(params, pts, dirs)
    out_bf16 = pallas_mlp_t.fused_nerf_mlp(params, pts, dirs,
                                           compute_dtype="bfloat16")
    assert out_bf16.dtype == jnp.float32
    scale = np.abs(np.asarray(out_f32)).max()
    assert np.allclose(out_f32, out_bf16, atol=2e-2 * scale)
    assert not np.array_equal(np.asarray(out_f32), np.asarray(out_bf16))

    def loss(p, x, d):
        return jnp.sum(
            pallas_mlp_t.fused_nerf_mlp(p, x, d, compute_dtype="bfloat16")
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(params, pts, dirs)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_padding_nondivisible():
    # R*S = 5*64 = 320, far from a TILE multiple
    params, pts, dirs = _inputs(R=5)
    out_t = pallas_mlp_t.fused_nerf_mlp(params, pts, dirs)
    out_j = nerf_mod.apply(params, pts, dirs)
    assert np.allclose(out_t, out_j, atol=2e-4)


def test_barf_band_weights_match_jnp():
    """BARF coarse-to-fine row weights in-kernel vs the jnp path, fwd+grad."""
    from benerf_tpu.models import embedder

    params, pts, dirs = _inputs(R=6)
    w = embedder.barf_c2f_weights(jnp.asarray(1000), 8000, 10, 0.1, 0.5)
    wv = embedder.barf_c2f_weights(jnp.asarray(1000), 8000, 4, 0.1, 0.5)

    def loss_t(p, x, d):
        return jnp.sum(jnp.sin(pallas_mlp_t.fused_nerf_mlp(
            p, x, d, barf_weights=w, barf_weights_views=wv)))

    def loss_j(p, x, d):
        return jnp.sum(jnp.sin(nerf_mod.apply(
            p, x, d, barf_weights=w, barf_weights_views=wv)))

    out_t = pallas_mlp_t.fused_nerf_mlp(params, pts, dirs, barf_weights=w,
                                        barf_weights_views=wv)
    out_j = nerf_mod.apply(params, pts, dirs, barf_weights=w,
                           barf_weights_views=wv)
    assert np.allclose(out_t, out_j, atol=2e-4), (
        np.abs(np.asarray(out_t) - np.asarray(out_j)).max()
    )
    gt = jax.grad(loss_t, argnums=(0, 1, 2))(params, pts, dirs)
    gj = jax.grad(loss_j, argnums=(0, 1, 2))(params, pts, dirs)
    for a, b in zip(jax.tree.leaves(gt), jax.tree.leaves(gj)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        assert np.allclose(a, b, atol=5e-4 * max(scale, 1.0))


# NOTE on test_bfloat16_mode: the fwd/grad difference it asserts is real in
# interpreter mode (CPU evaluates f32 matmuls exactly, so the explicit bf16
# casts change results). On a real TPU at Precision.DEFAULT the MXU ingests
# bf16 either way, so the two modes compile to identical compute — the
# documented design (PROFILE_r04.md), not a plumbing failure.


def test_band_row_weights_layout():
    from benerf_tpu.ops.pallas_mlp_t import band_row_weights, PE_PAD

    w = jnp.arange(10, dtype=jnp.float32) / 10.0
    pw = np.asarray(band_row_weights(w, 10, pad=PE_PAD))
    assert pw.shape == (PE_PAD, 1)
    np.testing.assert_array_equal(pw[:3, 0], 1.0)       # identity rows
    np.testing.assert_array_equal(pw[3:9, 0], w[0])     # freq-0 sin+cos x3
    np.testing.assert_array_equal(pw[9:15, 0], w[1])
    np.testing.assert_array_equal(pw[63:, 0], 0.0)      # padding rows
    ones = np.asarray(band_row_weights(None, 10, pad=PE_PAD))
    np.testing.assert_array_equal(ones[:63, 0], 1.0)


def test_bfloat16_noop_warning():
    """compute_dtype='bfloat16' on the fused-transposed dispatch is a no-op
    on real TPU hardware (MXU ingests bf16 at Precision.DEFAULT either way;
    PROFILE_r04.md). The dispatcher must say so instead of silently running
    fp32-identical compute (VERDICT r4 weak #3)."""
    import warnings

    from benerf_tpu.ops import mlp as mlp_ops

    params, pts, dirs = _inputs(R=8)
    mlp_ops.force_interpret(True)
    try:
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out = mlp_ops.mlp_forward(
                params, pts, dirs, compute_dtype="bfloat16"
            )
        assert out.shape == (8, 64, 4)
        msgs = [str(w.message) for w in rec]
        assert any("no effect on the fused-transposed" in m for m in msgs), msgs

        # fp32 mode must NOT warn
        with warnings.catch_warnings(record=True) as rec2:
            warnings.simplefilter("always")
            mlp_ops.mlp_forward(params, pts, dirs, compute_dtype="float32")
        assert not any(
            "fused-transposed" in str(w.message) for w in rec2
        )
    finally:
        mlp_ops.force_interpret(False)


def test_pretransposed_weights_variant_matches():
    """NATURAL_WEIGHTS=False (r4-measured-fastest packing) must be
    numerically identical to the natural-orientation path, fwd + grads."""
    params, pts, dirs = _inputs(R=8)

    def loss(p):
        return jnp.sum(pallas_mlp_t.fused_nerf_mlp(p, pts, dirs) ** 2)

    out_nat = pallas_mlp_t.fused_nerf_mlp(params, pts, dirs)
    g_nat = jax.grad(loss)(params)
    pallas_mlp_t.NATURAL_WEIGHTS = False
    try:
        out_t = pallas_mlp_t.fused_nerf_mlp(params, pts, dirs)
        g_t = jax.grad(loss)(params)
    finally:
        pallas_mlp_t.NATURAL_WEIGHTS = True
    np.testing.assert_allclose(np.asarray(out_nat), np.asarray(out_t),
                               rtol=0, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_nat), jax.tree.leaves(g_t)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.allclose(a, b, atol=1e-4 * scale)


def test_bwd_tile_not_dividing_fwd_pad():
    """BWD_TILE=768 does not divide 1024-multiples: fused_nerf_mlp must pad
    to lcm(TILE, BWD_TILE) or the backward grid silently drops the tail's
    gradients (caught in the r5 tile sweep)."""
    params, pts, dirs = _inputs(R=16, S=64)  # n=1024: old padding kept 1024

    def loss(p, x):
        return jnp.sum(pallas_mlp_t.fused_nerf_mlp(p, x, dirs) ** 2)

    g_ref = jax.grad(loss, argnums=1)(params, pts)
    old = pallas_mlp_t.BWD_TILE
    pallas_mlp_t.BWD_TILE = 768
    try:
        g = jax.grad(loss, argnums=1)(params, pts)
    finally:
        pallas_mlp_t.BWD_TILE = old
    a, b = np.asarray(g), np.asarray(g_ref)
    scale = max(np.abs(b).max(), 1e-9)
    # the tail rows (points 768..1023) are exactly where the old bug zeroed
    assert np.abs(a - b).max() < 1e-4 * scale
    assert np.abs(a.reshape(-1, 3)[800:]).sum() > 0
