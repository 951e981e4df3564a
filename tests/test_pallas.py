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
    assert not pallas_mlp.supports(params, jnp.zeros((4, 7, 3)))  # 7 !| TILE
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
