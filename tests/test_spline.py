"""Unit + golden-parity tests for the SE(3) B-spline trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from benerf_tpu.geometry import se3, spline


def test_golden_cubic_spline(golden):
    poses = spline.cubic_bspline_pose(
        jnp.asarray(golden["spline_knots"]), jnp.asarray(golden["spline_ts"])
    )
    assert poses.shape == golden["spline_poses"].shape
    assert np.allclose(poses, golden["spline_poses"], atol=1e-5)


def test_golden_cubic_spline_big_rotations(golden):
    poses = spline.cubic_bspline_pose(
        jnp.asarray(golden["spline_knots_big"]), jnp.asarray(golden["spline_ts"])
    )
    assert np.allclose(poses, golden["spline_poses_big"], atol=1e-5)


def test_golden_linear(golden):
    knots = jnp.asarray(golden["spline_knots"])
    poses = spline.linear_pose(knots[0], knots[3], jnp.asarray(golden["spline_ts"]))
    assert np.allclose(poses, golden["linear_poses"], atol=1e-5)


def test_identity_knots_give_identity_pose():
    knots = jnp.zeros((4, 6))
    poses = spline.cubic_bspline_pose(knots, jnp.asarray([0.25, 0.5, 0.9]))
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=-1)
    assert np.allclose(poses, jnp.broadcast_to(eye, poses.shape), atol=1e-6)


def test_rotations_are_orthonormal():
    rng = np.random.default_rng(5)
    knots = jnp.asarray(rng.normal(scale=0.4, size=(4, 6)).astype(np.float32))
    poses = spline.cubic_bspline_pose(knots, jnp.linspace(0.0, 1.0, 9))
    R = np.asarray(poses[..., :3])
    for m in R:
        assert np.allclose(m @ m.T, np.eye(3), atol=1e-5)


def test_gradients_flow_to_knots():
    """The pose must be differentiable w.r.t. the knots at arbitrary times,
    including the endpoint-nudged samples (the whole point of BeNeRF)."""

    def loss(knots):
        poses = spline.cubic_bspline_pose(knots, jnp.asarray([0.0, 0.3, 1.0]))
        return jnp.sum(poses**2)

    g = jax.grad(loss)(jnp.full((4, 6), 0.01))
    assert np.all(np.isfinite(g))
    assert np.any(np.abs(g) > 0)

    # zero knots (transform init) must also be grad-safe
    g0 = jax.grad(loss)(jnp.zeros((4, 6)))
    assert np.all(np.isfinite(g0))


def test_interpolate_poses_matches_direct_call():
    rng = np.random.default_rng(6)
    knots = jnp.asarray(rng.random((4, 6)).astype(np.float32) * 0.01)
    out = spline.interpolate_poses(knots, 0.2, 0.8, 19, traj="spline")
    ts = jnp.linspace(0.2, 0.8, 19)
    direct = spline.cubic_bspline_pose(knots, ts)
    assert np.allclose(out, direct, atol=1e-6)
    assert out.shape == (19, 3, 4)


def test_linear_endpoints_match_knots():
    rng = np.random.default_rng(7)
    k0 = jnp.asarray(rng.normal(scale=0.3, size=(6,)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(scale=0.3, size=(6,)).astype(np.float32))
    poses = spline.linear_pose(k0, k1, jnp.asarray([0.0, 1.0]))
    q0, t0 = se3.se3_to_qt(k0)
    q1, t1 = se3.se3_to_qt(k1)
    assert np.allclose(poses[0, :, 3], t0, atol=1e-4)
    assert np.allclose(poses[1, :, 3], t1, atol=1e-4)
    assert np.allclose(poses[0, :, :3], se3.q_to_R(q0), atol=1e-4)
    assert np.allclose(poses[1, :, :3], se3.q_to_R(q1), atol=1e-4)
