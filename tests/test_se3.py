"""Unit + golden-parity tests for benerf_tpu.geometry.se3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benerf_tpu.geometry import se3

jax.config.update("jax_enable_x64", False)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    r = rng.normal(scale=0.7, size=(50, 3)).astype(np.float32)
    q = se3.exp_r2q(jnp.asarray(r))
    assert np.allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)
    r2 = se3.log_q2r(q)
    assert np.allclose(r, r2, atol=1e-5)


def test_exp_log_tiny_angle():
    r = jnp.asarray([[1e-12, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = se3.exp_r2q(r)
    assert np.allclose(q[:, 3], 1.0, atol=1e-9)
    r2 = se3.log_q2r(q)
    assert np.all(np.isfinite(r2))


def test_grad_safe_at_singularities():
    """Gradients must be finite at theta == 0 (the NaN-leak trap)."""

    def f(r):
        return jnp.sum(se3.exp_r2q(r))

    g = jax.grad(f)(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(g))

    def h(wu):
        return jnp.sum(se3.se3_to_SE3(wu))

    g2 = jax.grad(h)(jnp.zeros((6,)))
    assert np.all(np.isfinite(g2))

    def l(q):
        return jnp.sum(se3.log_q2r(q))

    g3 = jax.grad(l)(jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    assert np.all(np.isfinite(g3))


def test_qmul_matches_matrix_form():
    rng = np.random.default_rng(1)
    q1 = rng.normal(size=(4,)).astype(np.float32)
    q1 /= np.linalg.norm(q1)
    q2 = rng.normal(size=(4,)).astype(np.float32)
    q2 /= np.linalg.norm(q2)
    q12 = se3.qmul(jnp.asarray(q1), jnp.asarray(q2))
    R12 = se3.q_to_R(q12)
    R1R2 = se3.q_to_R(jnp.asarray(q1)) @ se3.q_to_R(jnp.asarray(q2))
    assert np.allclose(R12, R1R2, atol=1e-6)


def test_se3_SE3_roundtrip():
    rng = np.random.default_rng(2)
    wu = rng.normal(scale=0.5, size=(20, 6)).astype(np.float32)
    Rt = se3.se3_to_SE3(jnp.asarray(wu))
    back = se3.SE3_to_se3(Rt)
    assert np.allclose(wu, back, atol=2e-4)


def test_rotation_orthonormal():
    rng = np.random.default_rng(3)
    wu = rng.normal(scale=1.2, size=(20, 6)).astype(np.float32)
    Rt = se3.se3_to_SE3(jnp.asarray(wu))
    R = np.asarray(Rt[..., :3])
    eye = np.eye(3)
    for m in R:
        assert np.allclose(m @ m.T, eye, atol=1e-5)
        assert np.isclose(np.linalg.det(m), 1.0, atol=1e-5)


# --- golden parity vs the torch reference ---------------------------------


def test_golden_exp_r2q(golden):
    q = se3.exp_r2q(jnp.asarray(golden["rotvecs"]))
    assert np.allclose(q, golden["exp_r2q"], atol=1e-6)


def test_golden_log_q2r(golden):
    r = se3.log_q2r(jnp.asarray(golden["exp_r2q"]))
    assert np.allclose(r, golden["log_q2r"], atol=1e-6)


def test_golden_se3_to_SE3(golden):
    Rt = se3.se3_to_SE3(jnp.asarray(golden["se3_twists"]))
    assert np.allclose(Rt, golden["se3_to_SE3"], atol=1e-5)
    Rt_tiny = se3.se3_to_SE3(jnp.asarray(golden["se3_twists_tiny"]))
    assert np.allclose(Rt_tiny, golden["se3_to_SE3_tiny"], atol=1e-7)


def test_golden_SE3_to_se3(golden):
    wu = se3.SE3_to_se3(jnp.asarray(golden["se3_to_SE3"]))
    assert np.allclose(wu, golden["SE3_to_se3"], atol=1e-4)
