"""SE(3) / SO(3) / quaternion math, numerically safe under jit+grad.

Behavioral contract follows the reference math in /root/reference/spline.py:
  - quaternions are stored xyzw                      (spline.py:75)
  - exp map of a rotation vector w uses theta = |w|/2 (spline.py:66,81)
  - log map returns a rotation vector r with |r| = full angle (spline.py:150-192)
  - V-matrix form of the se(3) exp/log               (spline.py:4-26,194-236)

All branchy small-angle functions use the "double-where" trick so that
gradients never see NaN from the unselected branch (jnp.where backprop
propagates 0 * NaN = NaN otherwise) — this replaces the reference's
torch.where branches (spline.py:83,176) which rely on theta never being
exactly at the singular point.

Shapes: every function broadcasts over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle thresholds mirroring the reference's choices
# (spline.py:79 eps=1e-9 for exp, spline.py:167 eps_theta=1e-20, eps_w=1e-10).
EXP_EPS = 1e-9
LOG_EPS_THETA = 1e-20
LOG_EPS_W = 1e-10


def _safe(pred, x, safe_value=1.0):
    """Replace x by safe_value where pred, so the unselected branch of an
    outer jnp.where computes finite values (and finite gradients)."""
    return jnp.where(pred, jnp.asarray(safe_value, x.dtype), x)


def safe_norm(x, axis=-1, keepdims=False):
    """L2 norm with finite gradient at x == 0.

    d|x|/dx = x/|x| NaNs at the origin (exactly where the zero-initialized
    se(3) transform starts, model/optimize.py:27-29); sqrt(sum + 1e-30) keeps
    the value within 1e-14 relative for |x| > 1e-8 while making the gradient
    exactly 0 at the origin.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + 1e-30)


def skew(w):
    """(...,3) -> (...,3,3) skew-symmetric matrix. Ref: spline.py:28-34."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zero, -w2, w1], axis=-1),
            jnp.stack([w2, zero, -w0], axis=-1),
            jnp.stack([-w1, w0, zero], axis=-1),
        ],
        axis=-2,
    )


# --- sin/cos ratio helpers -------------------------------------------------
# Exact closed forms with 4th-order Taylor fallbacks near 0. The reference
# evaluates 10-term Taylor series everywhere (spline.py:36-62); for the
# operating range (theta << pi) both agree to fp32 precision, and the closed
# form is exact for large angles where the truncated series would drift.

_TAYLOR_SWITCH = 1e-3  # theta below this -> series (theta^6 term < 1e-19)


def sinx_over_x(x):
    """sin(x)/x, a.k.a. taylor_A (spline.py:36-44)."""
    small = jnp.abs(x) < _TAYLOR_SWITCH
    x2 = x * x
    series = 1.0 - x2 / 6.0 + (x2 * x2) / 120.0
    exact = jnp.sin(x) / _safe(small, x)
    return jnp.where(small, series, exact)


def one_minus_cos_over_x2(x):
    """(1-cos(x))/x^2, a.k.a. taylor_B (spline.py:46-53)."""
    small = jnp.abs(x) < _TAYLOR_SWITCH
    x2 = x * x
    series = 0.5 - x2 / 24.0 + (x2 * x2) / 720.0
    exact = (1.0 - jnp.cos(x)) / _safe(small, x2)
    return jnp.where(small, series, exact)


def x_minus_sin_over_x3(x):
    """(x-sin(x))/x^3, a.k.a. taylor_C (spline.py:55-62)."""
    small = jnp.abs(x) < _TAYLOR_SWITCH
    x2 = x * x
    series = 1.0 / 6.0 - x2 / 120.0 + (x2 * x2) / 5040.0
    exact = (x - jnp.sin(x)) / _safe(small, x2 * x)
    return jnp.where(small, series, exact)


# --- quaternion algebra (xyzw) --------------------------------------------


def qmul(q1, q2):
    """Hamilton product q1 (x) q2, xyzw layout.

    Equals q_to_Q_parallel(q1) @ q2 in the reference (spline.py:130-138).
    """
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def qconj(q):
    """Quaternion conjugate. Ref: spline.py:145-148."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def exp_r2q(r):
    """Rotation vector (full angle |r|) -> unit quaternion xyzw.

    theta = |r|/2; q = [sin(theta)/(2 theta) * r, cos(theta)].
    Taylor branch below EXP_EPS. Ref: spline.py:79-100.
    """
    theta = 0.5 * safe_norm(r, keepdims=True)
    small = theta < EXP_EPS
    t2 = theta * theta
    # sin(theta) / (2 theta) = 1/2 - theta^2/12 + theta^4/240
    lam_series = 0.5 - t2 / 12.0 + (t2 * t2) / 240.0
    lam_exact = jnp.sin(theta) / (2.0 * _safe(small, theta))
    lam = jnp.where(small, lam_series, lam_exact)
    qw_series = 1.0 - t2 / 2.0 + (t2 * t2) / 24.0
    qw = jnp.where(small, qw_series, jnp.cos(theta))
    return jnp.concatenate([lam * r, qw], axis=-1)


def log_q2r(q):
    """Unit quaternion xyzw -> rotation vector (full angle).

    lambda = 2 atan(theta/w)/theta with theta = |q_xyz|; series branch for
    theta ~ 0 and +-pi/theta branch for w ~ 0. Ref: spline.py:167-192.
    """
    xyz = q[..., :3]
    w = q[..., 3:4]
    theta = safe_norm(xyz, keepdims=True)

    small_theta = theta < LOG_EPS_THETA
    small_w = jnp.abs(w) < LOG_EPS_W

    theta_s = _safe(small_theta, theta)
    w_s = _safe(small_w, w)

    lam_w0 = jnp.where(w < 0, -jnp.pi, jnp.pi) / theta_s
    lam_series = 2.0 / w_s - 2.0 / 3.0 * (theta * theta) / (w_s * w_s * w_s)
    lam_exact = 2.0 * jnp.arctan(theta / w_s) / theta_s
    lam = jnp.where(small_w, lam_w0, jnp.where(small_theta, lam_series, lam_exact))
    return lam * xyz


def q_to_R(q):
    """Unit quaternion xyzw -> (...,3,3) rotation matrix. Ref: spline.py:111-118."""
    qb, qc, qd, qa = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (qc**2 + qd**2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2 * (qb * qc + qa * qd), 1 - 2 * (qb**2 + qd**2), 2 * (qc * qd - qa * qb)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb**2 + qc**2)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


# --- se(3) <-> (q, t) and SE(3) -------------------------------------------


def se3_to_qt(wu):
    """se(3) twist (...,6) [w|u] -> (unit quaternion (...,4), translation (...,3)).

    t = V(w) u with V = I + B wx + C wx^2. Ref: spline.py:16-26.
    """
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta = safe_norm(w)[..., None, None]
    eye = jnp.eye(3, dtype=wu.dtype)
    V = (
        eye
        + one_minus_cos_over_x2(theta) * wx
        + x_minus_sin_over_x3(theta) * (wx @ wx)
    )
    t = (V @ u[..., None])[..., 0]
    return exp_r2q(w), t


def se3_to_SE3(wu):
    """se(3) twist (...,6) -> (...,3,4) pose [R|t]. Ref: spline.py:225-236."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta = safe_norm(w)[..., None, None]
    eye = jnp.eye(3, dtype=wu.dtype)
    wx2 = wx @ wx
    R = eye + sinx_over_x(theta) * wx + one_minus_cos_over_x2(theta) * wx2
    V = eye + one_minus_cos_over_x2(theta) * wx + x_minus_sin_over_x3(theta) * wx2
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


def SO3_to_so3(R, eps=1e-7):
    """(...,3,3) rotation -> rotation vector. Ref: spline.py:207-214."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    theta = jnp.mod(jnp.arccos(cos_t), jnp.pi)[..., None, None]
    lnR = (R - jnp.swapaxes(R, -2, -1)) / (2.0 * sinx_over_x(theta) + 1e-8)
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def SE3_to_se3(Rt, eps=1e-8):
    """(...,3,4) pose -> se(3) twist (...,6). Ref: spline.py:194-205."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew(w)
    theta = safe_norm(w)[..., None, None]
    eye = jnp.eye(3, dtype=Rt.dtype)
    A = sinx_over_x(theta)
    B = one_minus_cos_over_x2(theta)
    invV = eye - 0.5 * wx + (1.0 - A / (2.0 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)
