"""Golden-parity tests: positional encoding + full NeRF MLP forward."""

import jax
import jax.numpy as jnp
import numpy as np

from benerf_tpu.models import crf, embedder, nerf, torch_compat


def test_golden_positional_encoding(golden):
    pe = embedder.positional_encoding(jnp.asarray(golden["pe_pts"]), 10)
    assert pe.shape[-1] == 63
    assert np.allclose(pe, golden["pe_out"], atol=1e-5)
    pev = embedder.positional_encoding(jnp.asarray(golden["pe_pts"]), 4)
    assert pev.shape[-1] == 27
    assert np.allclose(pev, golden["pe_out_views"], atol=1e-6)


def _golden_mlp_params(golden):
    sd = {
        k.split("::", 1)[1]: v for k, v in golden.items() if k.startswith("mlp_w::")
    }
    return torch_compat.nerf_params_from_state_dict(sd)


def test_golden_mlp_forward(golden):
    params = _golden_mlp_params(golden)
    raw = nerf.apply(
        params,
        jnp.asarray(golden["mlp_pts"]),
        jnp.asarray(golden["mlp_dirs"]),
        num_freqs=10,
        num_freqs_views=4,
    )
    assert raw.shape == golden["mlp_raw"].shape
    assert np.allclose(raw, golden["mlp_raw"], atol=2e-4)


def test_mlp_init_shapes():
    params = nerf.init_params(jax.random.PRNGKey(0), channels=3)
    assert params["pts"][0]["w"].shape == (63, 256)
    assert params["pts"][5]["w_pe"].shape == (63, 256)
    assert params["pts"][5]["w_h"].shape == (256, 256)
    assert params["views"]["w_feat"].shape == (256, 128)
    assert params["views"]["w_pe"].shape == (27, 128)
    assert params["rgb"]["w"].shape == (128, 3)
    out = nerf.apply(
        params,
        jnp.zeros((2, 5, 3)),
        jnp.asarray([[0.0, 0.0, -1.0]] * 2),
    )
    assert out.shape == (2, 5, 4)
    assert np.all(np.isfinite(out))


def test_mlp_gray_channels():
    params = nerf.init_params(jax.random.PRNGKey(1), channels=1)
    out = nerf.apply(params, jnp.zeros((3, 4, 3)), jnp.zeros((3, 3)))
    assert out.shape == (3, 4, 2)


def test_mlp_bf16_close_to_f32():
    params = nerf.init_params(jax.random.PRNGKey(2), channels=3)
    pts = jax.random.normal(jax.random.PRNGKey(3), (8, 16, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
    f32 = nerf.apply(params, pts, dirs)
    bf16 = nerf.apply(params, pts, dirs, compute_dtype=jnp.bfloat16)
    assert np.allclose(f32, bf16, atol=0.15)  # bf16 has ~3 decimal digits


def test_barf_weights_ramp():
    w0 = embedder.barf_c2f_weights(0, 100, 10, 0.1, 0.5)
    assert np.allclose(w0, 0.0)
    w1 = embedder.barf_c2f_weights(50, 100, 10, 0.1, 0.5)
    assert np.allclose(w1, 1.0)
    wm = embedder.barf_c2f_weights(30, 100, 10, 0.1, 0.5)
    assert np.all(np.diff(np.asarray(wm)) <= 1e-6)  # monotone non-increasing


def test_crf_apply():
    params = crf.init_params(jax.random.PRNGKey(0), hidden=0, width=128)
    x = jnp.linspace(0, 1, 11)[:, None]
    y = crf.apply(params, x)
    assert y.shape == (11, 1)
    assert np.all((np.asarray(y) > 0) & (np.asarray(y) < 1))
