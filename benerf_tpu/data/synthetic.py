"""Synthetic BeNeRF-format scene generator.

No dataset ships with this container, so tests, benchmarks, and end-to-end
demos generate a physically consistent miniature scene: an analytic
Gaussian-blob radiance field volume-rendered along a known cubic-B-spline
camera trajectory; the blurry input image is the exposure-time average and
the event stream is ESIM-style per-pixel log-intensity threshold crossings
between consecutive virtual frames.

`write_benerf_blender_scene` serializes it in the exact on-disk layout of the
BeNeRF_Blender datasets (images/*.png + images_test/*.png + events/events.npy
rows [x,y,t,p] + poses_ts.txt; /root/reference/load_data.py:12-28,92-96,
295-299), so the real dataset loaders are exercised end-to-end.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from benerf_tpu.geometry import spline as spline_mod


@dataclass
class BlobScene:
    centers: np.ndarray  # (K,3)
    scales: np.ndarray   # (K,)
    colors: np.ndarray   # (K,3)
    densities: np.ndarray  # (K,)
    background: np.ndarray = field(default_factory=lambda: np.zeros(3))


def make_scene(seed: int = 0, n_blobs: int = 7) -> BlobScene:
    rng = np.random.default_rng(seed)
    centers = np.stack(
        [
            rng.uniform(-1.2, 1.2, n_blobs),
            rng.uniform(-0.9, 0.9, n_blobs),
            rng.uniform(-5.0, -2.5, n_blobs),
        ],
        axis=-1,
    )
    scales = rng.uniform(0.25, 0.6, n_blobs)
    colors = rng.uniform(0.2, 1.0, (n_blobs, 3))
    densities = rng.uniform(4.0, 12.0, n_blobs)
    return BlobScene(centers, scales, colors, densities)


def field_at(scene: BlobScene, pts: np.ndarray):
    """sigma (..., ) and rgb (..., 3) of the analytic field at pts (..., 3)."""
    d2 = np.sum(
        (pts[..., None, :] - scene.centers) ** 2, axis=-1
    )  # (..., K)
    g = np.exp(-0.5 * d2 / scene.scales**2)  # (..., K)
    sigma = np.sum(scene.densities * g, axis=-1)
    wsum = np.sum(g, axis=-1, keepdims=True) + 1e-9
    rgb = (g @ scene.colors) / wsum
    return sigma, np.clip(rgb, 0.0, 1.0)


def render_frame(scene, pose, H, W, K, n_samples=128, near=1.0, far=8.0):
    """Reference-convention volume render of the analytic field (numpy).

    pose: (3,4) camera-to-world, OpenGL-style look-down--z like the training
    renderer (render/rays.py).
    """
    i, j = np.meshgrid(np.arange(W), np.arange(H))
    dirs = np.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -np.ones_like(i)],
        axis=-1,
    )  # (H,W,3)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = pose[:3, 3]

    z = np.linspace(near, far, n_samples)
    pts = rays_o + rays_d[..., None, :] * z[:, None]  # (H,W,S,3)
    sigma, rgb = field_at(scene, pts)

    dz = np.diff(z, append=z[-1] + (z[-1] - z[-2]))
    dz = dz * np.linalg.norm(rays_d, axis=-1)[..., None]
    alpha = 1.0 - np.exp(-sigma * dz)
    trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = np.concatenate([np.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    w = alpha * trans
    img = np.sum(w[..., None] * rgb, axis=-2)
    return np.clip(img, 0.0, 1.0)


def events_from_frames(frames, t_lo, t_hi, threshold=0.1, eps=1e-9, seed=0):
    """ESIM-style event synthesis from a frame stack (F,H,W,3).

    Per pixel, events fire whenever log-gray crosses multiples of the
    threshold from a per-pixel reference level; timestamps interpolate
    linearly inside each inter-frame interval. Returns (N,4) [x,y,t,p].
    """
    rng = np.random.default_rng(seed)
    gray = frames @ np.array([0.299, 0.587, 0.114])
    logi = np.log(gray + eps)
    F, H, W = logi.shape
    times = np.linspace(t_lo, t_hi, F)
    ref = logi[0].copy()
    out = []
    for f in range(1, F):
        delta = logi[f] - ref
        n = np.floor(np.abs(delta) / threshold).astype(int)
        ys, xs = np.nonzero(n)
        for y, x in zip(ys, xs):
            cnt = n[y, x]
            pol = np.sign(delta[y, x])
            # spread the events uniformly in this inter-frame interval
            tt = np.sort(rng.uniform(times[f - 1], times[f], cnt))
            for t in tt:
                out.append((x, y, t, pol))
            ref[y, x] += pol * cnt * threshold
    if not out:
        return np.zeros((0, 4))
    return np.array(out, np.float64)


def make_trajectory(seed=0, scale=0.06):
    """Random small se(3) knots (the GT trajectory to recover)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(scale=scale, size=(1, 6))
    deltas = np.cumsum(rng.normal(scale=scale, size=(4, 6)), axis=0)
    return (base + deltas).astype(np.float32)


def write_benerf_blender_scene(
    outdir: str,
    H: int = 80,
    W: int = 80,
    focal: float = 90.0,
    n_virtual: int = 17,
    threshold: float = 0.1,
    seed: int = 0,
    n_images: int = 2,
):
    """Write a BeNeRF_Blender-format scene directory; returns ground truth.

    Timeline: poses_ts.txt has n_images+1 stamps (ms-style units); image i's
    exposure spans [ts[i], ts[i+1]] (load_data.py:92-96). The camera follows
    a cubic spline over the whole timeline.
    """
    from imageio.v3 import imwrite

    scene = make_scene(seed)
    knots = make_trajectory(seed)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float64)

    ts = np.linspace(0.0, 1000.0 * n_images, n_images + 1)

    os.makedirs(os.path.join(outdir, "images"), exist_ok=True)
    os.makedirs(os.path.join(outdir, "images_test"), exist_ok=True)
    os.makedirs(os.path.join(outdir, "events"), exist_ok=True)

    all_events = []
    gt = {"scene": scene, "knots": knots, "K": K, "poses_ts": ts}
    import jax.numpy as jnp

    for idx in range(n_images):
        u_lo = idx / n_images
        u_hi = (idx + 1) / n_images
        us = np.linspace(u_lo, u_hi, n_virtual)
        poses = np.asarray(
            spline_mod.cubic_bspline_pose(jnp.asarray(knots), jnp.asarray(us))
        )
        frames = np.stack(
            [render_frame(scene, p, H, W, K) for p in poses], axis=0
        )
        blurry = frames.mean(axis=0)
        sharp = frames[len(frames) // 2]
        imwrite(
            os.path.join(outdir, "images", f"{idx:03d}.png"),
            (np.clip(blurry, 0, 1) * 255).astype(np.uint8),
        )
        imwrite(
            os.path.join(outdir, "images_test", f"{idx:03d}.png"),
            (np.clip(sharp, 0, 1) * 255).astype(np.uint8),
        )
        ev = events_from_frames(frames, ts[idx], ts[idx + 1], threshold, seed=seed + idx)
        if len(ev):
            all_events.append(ev)
        gt[f"frames_{idx}"] = frames

    events = (
        np.concatenate(all_events, axis=0)
        if all_events
        else np.zeros((0, 4))
    )
    events = events[events[:, 2].argsort()]
    np.save(os.path.join(outdir, "events", "events.npy"), events)
    np.savetxt(os.path.join(outdir, "poses_ts.txt"), ts)
    # Ground-truth trajectory sidecar: lets datasets.load_scene populate
    # SceneData.gt_knots so training reports in-train ATE/RPE pose recovery
    # (train/loop.py periodic_eval). Real datasets have no such file.
    np.savez(
        os.path.join(outdir, "gt_trajectory.npz"),
        knots=knots,
        t_lo=np.float64(ts[0]),
        t_hi=np.float64(ts[-1]),
    )
    return gt
