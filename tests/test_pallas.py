"""Fused Pallas MLP kernel vs the pure-jnp path (interpreter mode on CPU;
the same kernels compile on TPU — see bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benerf_tpu.models import nerf as nerf_mod
from benerf_tpu.ops import pallas_mlp


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_mlp.INTERPRET = True
    yield
    pallas_mlp.INTERPRET = False


def _inputs(R=16, S=64, channels=3, seed=0):
    params = nerf_mod.init_params(jax.random.PRNGKey(seed), channels=channels)
    pts = jax.random.normal(jax.random.PRNGKey(seed + 1), (R, S, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(seed + 2), (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return params, pts, dirs


def test_supports_predicate():
    params, pts, _ = _inputs()
    assert pallas_mlp.supports(params, pts)
    # any S is supported (the kernel is pointwise); an old TILE % S check
    # silently sent the S=192 fine pass to the jnp fallback
    assert pallas_mlp.supports(params, jnp.zeros((4, 7, 3)))
    assert pallas_mlp.supports(params, jnp.zeros((4, 192, 3)))
    no_views = {k: v for k, v in params.items() if k != "views"}
    assert not pallas_mlp.supports(no_views, pts)


@pytest.mark.parametrize("channels", [3, 1])
def test_forward_matches_jnp(channels):
    params, pts, dirs = _inputs(channels=channels)
    out_p = pallas_mlp.fused_nerf_mlp(params, pts, dirs)
    out_j = nerf_mod.apply(params, pts, dirs)
    assert out_p.shape == out_j.shape == (16, 64, channels + 1)
    assert np.allclose(out_p, out_j, atol=1e-4)


def test_forward_nondivisible_rays_padding():
    # R*S = 13*64 = 832, not a multiple of TILE=512 -> padded path
    params, pts, dirs = _inputs(R=13)
    out_p = pallas_mlp.fused_nerf_mlp(params, pts, dirs)
    out_j = nerf_mod.apply(params, pts, dirs)
    assert np.allclose(out_p, out_j, atol=1e-4)


def test_gradients_match_jnp():
    params, pts, dirs = _inputs(R=8)

    def loss_p(p, x, d):
        return jnp.sum(jnp.sin(pallas_mlp.fused_nerf_mlp(p, x, d)))

    def loss_j(p, x, d):
        return jnp.sum(jnp.sin(nerf_mod.apply(p, x, d)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(params, pts, dirs)
    gj = jax.grad(loss_j, argnums=(0, 1, 2))(params, pts, dirs)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gj)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        assert np.allclose(a, b, atol=3e-4 * max(scale, 1.0)), (
            f"grad mismatch: {np.abs(np.asarray(a) - np.asarray(b)).max()} "
            f"vs scale {scale}"
        )


def test_fine_pass_S128():
    params, pts, dirs = _inputs(R=4, S=128)
    out_p = pallas_mlp.fused_nerf_mlp(params, pts, dirs)
    out_j = nerf_mod.apply(params, pts, dirs)
    assert np.allclose(out_p, out_j, atol=1e-4)


def test_fine_pass_S192_fwd_and_grad():
    """The production fine pass (64 coarse + 128 importance samples)."""
    params, pts, dirs = _inputs(R=5, S=192)

    def loss_p(p, x, d):
        return jnp.sum(jnp.sin(pallas_mlp.fused_nerf_mlp(p, x, d)))

    def loss_j(p, x, d):
        return jnp.sum(jnp.sin(nerf_mod.apply(p, x, d)))

    assert np.allclose(
        pallas_mlp.fused_nerf_mlp(params, pts, dirs),
        nerf_mod.apply(params, pts, dirs), atol=1e-4,
    )
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(params, pts, dirs)
    gj = jax.grad(loss_j, argnums=(0, 1, 2))(params, pts, dirs)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gj)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        assert np.allclose(a, b, atol=3e-4 * max(scale, 1.0))


def test_bfloat16_mode_fwd_and_grad():
    """bf16 staging/activations: close to f32 at bf16 tolerances, and NOT
    bit-identical to it (the r3 'bf16' was a provable no-op)."""
    params, pts, dirs = _inputs(R=8)
    out_f32 = pallas_mlp.fused_nerf_mlp(params, pts, dirs)
    out_bf16 = pallas_mlp.fused_nerf_mlp(params, pts, dirs,
                                         compute_dtype="bfloat16")
    assert out_bf16.dtype == jnp.float32  # f32 accumulation/output
    scale = np.abs(np.asarray(out_f32)).max()
    assert np.allclose(out_f32, out_bf16, atol=2e-2 * scale)
    assert not np.array_equal(np.asarray(out_f32), np.asarray(out_bf16))

    def loss(p, x, d, dt):
        return jnp.sum(
            jnp.sin(pallas_mlp.fused_nerf_mlp(p, x, d, compute_dtype=dt))
        )

    g16 = jax.grad(loss, argnums=(0, 1, 2))(params, pts, dirs, "bfloat16")
    g32 = jax.grad(loss, argnums=(0, 1, 2))(params, pts, dirs, "float32")
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rms = lambda x: np.sqrt((x ** 2).mean())
        # bf16 PE/activations put ~0.4% rounding into every layer boundary;
        # measured worst leaf ~10% grad RMS on this synthetic input. The
        # trainability gate is the bf16 quality-harness run, not this bound.
        assert rms(a - b) < 0.15 * max(rms(b), 1e-6)
