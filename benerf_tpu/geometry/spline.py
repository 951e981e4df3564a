"""Cumulative cubic B-spline (and linear) camera trajectories on SE(3).

Behavioral contract (reference: /root/reference/spline.py:247-331):
  - 4 control knots given as se(3) twists; a sample time u in [0,1] spans the
    single spline segment.
  - translation is blended with the uniform cubic B-spline basis
    (1/6, 4/6, 1/6 with the cumulative-form cubic terms, spline.py:263-273);
  - rotation uses the *cumulative* basis on relative rotations:
        q(u) = q0 (x) exp(c1(u) log(q0^-1 q1))
                  (x) exp(c2(u) log(q1^-1 q2))
                  (x) exp(c3(u) log(q2^-1 q3))
    with c1 = 5/6 + u/2 - u^2/2 + u^3/6, c2 = 1/6 + u/2 + u^2/2 - u^3/3,
    c3 = u^3/6 (spline.py:276-295).
  - sample times exactly 0 / 1 are nudged inward by 1e-6 (spline.py:249-252).

Everything is pure jnp (fully fusable by XLA into the surrounding train step;
the pose math is tiny — O(poses) — but sits on the gradient path of every ray,
so it must be differentiable and branch-safe; see geometry/se3.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from benerf_tpu.geometry import se3 as se3m


def _nudge_endpoints(u):
    """Move samples at exactly 0 or 1 inward by 1e-6 (spline.py:249-252)."""
    u = jnp.where(u == 0.0, u + 1e-6, u)
    u = jnp.where(u == 1.0, u - 1e-6, u)
    return u


def cubic_bspline_pose(knots, u):
    """Interpolate SE(3) poses on one cubic B-spline segment.

    Args:
      knots: (4, 6) se(3) control knots [w|u].
      u: (T,) sample times in [0, 1].
    Returns:
      (T, 3, 4) camera-to-world poses [R|t].
    Ref: spline.py:247-303.
    """
    u = _nudge_endpoints(jnp.asarray(u))[..., None]  # (T,1)

    q0, t0 = se3m.se3_to_qt(knots[0])
    q1, t1 = se3m.se3_to_qt(knots[1])
    q2, t2 = se3m.se3_to_qt(knots[2])
    q3, t3 = se3m.se3_to_qt(knots[3])

    uu = u * u
    uuu = uu * u
    s = 1.0 / 6.0

    # translation basis (uniform cubic B-spline, cumulative form)
    c0 = s - 0.5 * u + 0.5 * uu - s * uuu
    c1 = 4.0 * s - uu + 0.5 * uuu
    c2 = s + 0.5 * u + 0.5 * uu - 0.5 * uuu
    c3 = s * uuu
    trans = c0 * t0 + c1 * t1 + c2 * t2 + c3 * t3  # (T,3)

    # rotation cumulative basis
    c1r = 5.0 * s + 0.5 * u - 0.5 * uu + s * uuu
    c2r = s + 0.5 * u + 0.5 * uu - 2.0 * s * uuu
    c3r = s * uuu

    r01 = se3m.log_q2r(se3m.qmul(se3m.qconj(q0), q1)) * c1r  # (T,3)
    r12 = se3m.log_q2r(se3m.qmul(se3m.qconj(q1), q2)) * c2r
    r23 = se3m.log_q2r(se3m.qmul(se3m.qconj(q2), q3)) * c3r

    q = se3m.qmul(
        jnp.broadcast_to(q0, r01.shape[:-1] + (4,)),
        se3m.qmul(se3m.exp_r2q(r01), se3m.qmul(se3m.exp_r2q(r12), se3m.exp_r2q(r23))),
    )

    R = se3m.q_to_R(q)  # (T,3,3)
    return jnp.concatenate([R, trans[..., None]], axis=-1)


def linear_pose(knot_start, knot_end, u):
    """SE(3) linear interpolation (slerp rotation + lerp translation).

    Args:
      knot_start, knot_end: (6,) se(3) twists.
      u: (T,) sample times.
    Returns: (T, 3, 4) poses. Ref: spline.py:305-331.
    """
    u = _nudge_endpoints(jnp.asarray(u))[..., None]  # (T,1)

    q_a, t_a = se3m.se3_to_qt(knot_start)
    q_b, t_b = se3m.se3_to_qt(knot_end)

    trans = (1.0 - u) * t_a + u * t_b

    r = u * se3m.log_q2r(se3m.qmul(se3m.qconj(q_a), q_b))
    q = se3m.qmul(jnp.broadcast_to(q_a, r.shape[:-1] + (4,)), se3m.exp_r2q(r))

    R = se3m.q_to_R(q)
    return jnp.concatenate([R, trans[..., None]], axis=-1)


def interpolate_poses(knots, t_start, t_end, num, traj="spline"):
    """Evenly interpolate `num` poses over [t_start, t_end].

    Mirrors Graph.get_pose_evt / get_pose_rgb (model/optimize.py:58-111):
    sample times are linspace(t_start, t_end, num) on the unit spline segment.

    Args:
      knots: (4,6) se(3) control knots.
      t_start, t_end: scalars (may be traced).
      num: static int.
      traj: "spline" (cubic) or "linear" (knot0 -> knot3).
    """
    ts = jnp.linspace(0.0, 1.0, num) * (t_end - t_start) + t_start
    if traj == "linear":
        return linear_pose(knots[0], knots[3], ts)
    elif traj == "spline":
        return cubic_bspline_pose(knots, ts)
    raise ValueError(f"unknown traj {traj!r}")
