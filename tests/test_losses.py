"""Loss function tests incl. golden brightness-log parity."""

import jax.numpy as jnp
import numpy as np

from benerf_tpu.train import loss as loss_mod


def test_golden_brightness_logs(golden):
    x = jnp.asarray(golden["bright_in"])
    assert np.allclose(
        loss_mod.brightness_log(x, "BeNeRF_Blender"),
        golden["bright_safelog"],
        atol=1e-6,
    )
    assert np.allclose(
        loss_mod.brightness_log(x, "E2NeRF_Synthetic"),
        golden["bright_linlog"],
        atol=1e-5,
    )


def test_rgb_to_gray_weights():
    rgb = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    g = loss_mod.rgb_to_gray(rgb)
    assert np.allclose(g[:, 0], [0.299, 0.587, 0.114])


def test_event_loss_synthetic_zero_when_consistent():
    """If rendered log-diff equals ETA*C exactly, the loss is 0."""
    rng = np.random.default_rng(0)
    b1 = jnp.asarray(rng.uniform(0.2, 0.8, (16, 1)).astype(np.float32))
    eta = jnp.asarray(rng.integers(-3, 4, (16, 1)).astype(np.float32))
    C = 0.1
    b2 = jnp.exp(jnp.log(b1 + 1e-9) + eta * C) - 1e-9
    l = loss_mod.event_loss_term(
        b1, b2, eta, dataset="BeNeRF_Blender", channels=1,
        event_threshold=C, coeff_syn=1.0, coeff_real=2.0,
    )
    assert float(l) < 1e-10


def test_event_loss_real_normalized_scale_invariant():
    """threshold=-1 branch compares directions: scaling ETA must not change it."""
    rng = np.random.default_rng(1)
    b1 = jnp.asarray(rng.uniform(0.2, 0.8, (32, 1)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(0.2, 0.8, (32, 1)).astype(np.float32))
    eta = jnp.asarray(rng.normal(size=(32, 1)).astype(np.float32))
    kw = dict(dataset="E2NeRF_Real", channels=1, event_threshold=-1.0,
              coeff_syn=1.0, coeff_real=2.0)
    l1 = loss_mod.event_loss_term(b1, b2, eta, **kw)
    l2 = loss_mod.event_loss_term(b1, b2, eta * 7.5, **kw)
    assert np.isclose(float(l1), float(l2), rtol=1e-5)


def test_blur_loss_equals_manual_mean():
    rng = np.random.default_rng(2)
    P, R, C = 5, 7, 3
    rays = jnp.asarray(rng.random((P * R, C)).astype(np.float32))
    target = jnp.asarray(rng.random((R, C)).astype(np.float32))
    l = loss_mod.blur_rgb_loss_term(rays, target, rgb_coeff=2.0)
    manual = np.mean(
        (np.asarray(rays).reshape(P, R, C).mean(0) - np.asarray(target)) ** 2
    )
    assert np.isclose(float(l), 2.0 * manual, rtol=1e-6)
