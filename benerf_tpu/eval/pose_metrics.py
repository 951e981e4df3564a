"""Trajectory quality metrics: ATE / RPE for the recovered spline poses.

BASELINE.json lists "spline-pose RPE" as a first-class metric (absent from
the reference code, which only dumps KITTI files for external evaluation —
utils/pose_utils.py). Implemented here so training/eval can report pose
recovery directly against the synthetic generator's ground-truth trajectory.

Both metrics align the estimate to the ground truth with a similarity
transform first (monocular NeRF trajectories are gauge-free: arbitrary
global rotation/translation/scale).
"""

from __future__ import annotations

import numpy as np


def _umeyama(src, dst):
    """Similarity transform (s, R, t) minimizing |dst - (s R src + t)|^2."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs**2).sum() / len(src)
    s = np.trace(np.diag(D) @ S) / (var_s + 1e-12)
    t = mu_d - s * R @ mu_s
    return s, R, t


def align_trajectories(est, gt):
    """est, gt: (N,3,4). Returns est aligned to gt (similarity transform on
    translations, rotation applied to orientations)."""
    est = np.asarray(est)
    gt = np.asarray(gt)
    s, R, t = _umeyama(est[:, :, 3], gt[:, :, 3])
    out = est.copy()
    out[:, :, 3] = (s * (R @ est[:, :, 3].T)).T + t
    out[:, :, :3] = R @ est[:, :, :3]
    return out


def ate_rmse(est, gt, align=True):
    """Absolute trajectory error (RMSE of translation) after alignment."""
    est = np.asarray(est)
    gt = np.asarray(gt)
    if align:
        est = align_trajectories(est, gt)
    d = est[:, :, 3] - gt[:, :, 3]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))


def _rot_angle(R):
    tr = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(tr))


def rpe(est, gt, delta: int = 1, align=True):
    """Relative pose error over pose pairs (i, i+delta).

    Returns dict with trans_rmse (same units as gt) and rot_rmse_deg.
    """
    est = np.asarray(est)
    gt = np.asarray(gt)
    if align:
        est = align_trajectories(est, gt)

    def rel(poses, i, j):
        Ri, ti = poses[i, :, :3], poses[i, :, 3]
        Rj, tj = poses[j, :, :3], poses[j, :, 3]
        R = Ri.T @ Rj
        t = Ri.T @ (tj - ti)
        return R, t

    terrs, rerrs = [], []
    for i in range(len(est) - delta):
        Re, te = rel(est, i, i + delta)
        Rg, tg = rel(gt, i, i + delta)
        terrs.append(np.linalg.norm(te - tg))
        rerrs.append(_rot_angle(Re.T @ Rg))
    return {
        "trans_rmse": float(np.sqrt(np.mean(np.square(terrs)))),
        "rot_rmse_deg": float(np.sqrt(np.mean(np.square(rerrs)))),
    }
