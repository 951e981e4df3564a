"""Unit tests for the pose-recovery metrics, especially the gauge-fixed
reprojection-flow error (the headline joint-recovery number)."""

import numpy as np

from benerf_tpu.eval import pose_metrics


def _toy_trajectory(n=9, radius=0.2, seed=0):
    """A curved c2w trajectory looking down -z from z ~ 0."""
    ts = np.linspace(0, 1, n)
    poses = []
    for t in ts:
        ang = 0.15 * np.sin(2 * np.pi * t)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        trans = np.array([radius * t, 0.05 * np.sin(3 * t), 0.02 * t])
        poses.append(np.concatenate([R, trans[:, None]], axis=1))
    return np.stack(poses)


K = np.array([[90.0, 0, 40.0], [0, 90.0, 40.0], [0, 0, 1.0]])


def test_flow_error_zero_on_identical():
    gt = _toy_trajectory()
    r = pose_metrics.reproj_flow_error(gt, gt, K, 4.0, 80, 80)
    assert r["flow_rmse_px"] < 1e-5
    assert r["gt_flow_rms_px"] > 1.0  # the toy motion is real


def test_flow_error_constant_estimate_scores_motion_magnitude():
    gt = _toy_trajectory()
    const = np.repeat(gt[len(gt) // 2][None], len(gt), axis=0)
    r = pose_metrics.reproj_flow_error(const, gt, K, 4.0, 80, 80)
    np.testing.assert_allclose(
        r["flow_rmse_px"], r["gt_flow_rms_px"], rtol=1e-6
    )


def test_flow_error_gauge_invariant_to_world_frame():
    """A global rigid change of world frame applied to the estimate must not
    change the score (the mid-pose anchoring removes it)."""
    gt = _toy_trajectory()
    est = _toy_trajectory(radius=0.15)  # imperfect estimate
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    G = np.array([[c, -s, 0, 0.3], [s, c, 0, -0.2], [0, 0, 1, 0.5]])
    est_moved = np.stack([pose_metrics._compose(G, e) for e in est])
    r1 = pose_metrics.reproj_flow_error(est, gt, K, 4.0, 80, 80)
    r2 = pose_metrics.reproj_flow_error(est_moved, gt, K, 4.0, 80, 80)
    np.testing.assert_allclose(r1["flow_rmse_px"], r2["flow_rmse_px"],
                               rtol=1e-9)


def test_ate_similarity_alignment_removes_gauge():
    gt = _toy_trajectory()
    est = gt.copy()
    est[:, :, 3] = est[:, :, 3] * 2.5 + np.array([1.0, -2.0, 0.3])
    assert pose_metrics.ate_rmse(est, gt) < 1e-9


def test_rpe_identical_is_zero():
    gt = _toy_trajectory()
    r = pose_metrics.rpe(gt, gt)
    # rot floor: arccos of a clipped trace loses half the sig figs near 1
    assert r["trans_rmse"] < 1e-9 and r["rot_rmse_deg"] < 1e-3
