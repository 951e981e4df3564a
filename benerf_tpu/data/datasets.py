"""Dataset loaders for the 4+1 formats supported by the reference
(/root/reference/load_data.py; format matrix in SURVEY.md §2.2).

All loading is host-side numpy (h5py / imageio / np.load); the returned
SceneData carries numpy arrays plus a device-ready EventArrays. Timestamp
normalization follows load_data.py:354-386: event ts -> [0,1] over the
(shifted) event range, image exposure interval mapped into the same unit
interval.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from benerf_tpu.data import events as events_mod


def _imread(path: str) -> np.ndarray:
    from imageio.v3 import imread

    img = imread(path)
    if img.ndim == 3:
        img = img[..., :3]
    return (img / 255.0).astype(np.float64)


@dataclass
class SceneData:
    events: events_mod.EventArrays  # normalized ts, sorted, device-ready
    image: np.ndarray               # (1, H, W, C) the blurry input
    imgtest: Optional[np.ndarray]   # (1, H, W, C) sharp GT or None
    rgb_exp_ts: np.ndarray          # (2,) normalized exposure [start, end]
    poses: Optional[np.ndarray] = None     # loaded rgb poses (loadpose)
    ev_poses: Optional[np.ndarray] = None  # loaded event poses
    trans: Optional[np.ndarray] = None     # loaded rgb<->event se(3) (loadtrans)
    raw_events: Optional[dict] = None      # un-normalized {x,y,ts,pol} (debug)
    gt_knots: Optional[np.ndarray] = None  # (4,6) GT spline knots (synthetic
                                           # scenes only; enables in-train
                                           # ATE/RPE pose-recovery metrics)
    gt_exp_us: Optional[np.ndarray] = None # (2,) exposure interval in the GT
                                           # spline's unit time (maps local
                                           # normalized ts -> GT trajectory u)


def _list_images(d: str):
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.lower().endswith(("jpg", "png"))
    ]


def _load_image_stack(datadir: str, sub: str, gray: bool, index: int):
    files = _list_images(os.path.join(datadir, sub))
    img = _imread(files[index])
    if gray:
        if img.ndim == 3:  # tolerate RGB files in gray configs
            img = img @ np.array([0.299, 0.587, 0.114])
        img = img[..., None]
    return img[None]  # (1,H,W,C)


def load_timestamps(datadir: str, cfg):
    """Exposure + (shifted) event range for the selected image.

    Ref: load_data.py:89-139. Returns (img_ts_start, img_ts_end,
    evt_ts_start, evt_ts_end) in raw dataset time units.
    """
    ds = cfg.dataset
    if ds in ("BeNeRF_Blender", "BeNeRF_Unreal"):
        ts = np.loadtxt(os.path.join(datadir, "poses_ts.txt"))
        starts, ends = ts[:-1], ts[1:]
        img_s, img_e = starts[cfg.index], ends[cfg.index]
    elif ds == "TUM_VIE":
        stamps = np.loadtxt(os.path.join(datadir, "image_timestamps.txt"))
        expos = np.loadtxt(os.path.join(datadir, "image_exposures.txt"))
        starts = stamps - 0.5 * expos
        ends = stamps + 0.5 * expos
        img_s, img_e = starts[cfg.index], ends[cfg.index]
    elif ds == "E2NeRF_Real":
        starts = np.loadtxt(os.path.join(datadir, "exposure_start_ts.txt"))
        ends = np.loadtxt(os.path.join(datadir, "exposure_end_ts.txt"))
        img_s, img_e = starts[cfg.index], ends[cfg.index]
    elif ds == "E2NeRF_Synthetic":
        path = os.path.join(
            datadir, "events", f"r_{cfg.index * 2}", "v2e-dvs-events.txt"
        )
        txt = np.loadtxt(path)
        img_s = int(txt[0, 0] * 1e19)   # load_data.py:116-119 scale quirk
        img_e = int(txt[-1, 0] * 1e19)
    else:
        raise ValueError(f"cannot load timestamps for dataset {ds!r}")

    evt_s = img_s - cfg.event_shift_start * 1e3  # load_data.py:129-137
    evt_e = img_e + cfg.event_shift_end * 1e3
    return img_s, img_e, evt_s, evt_e


def load_events_raw(datadir: str, cfg, evt_ts_start, evt_ts_end):
    """Raw event table (N,4) [x, y, t, p] cropped to the shifted range.

    Ref: load_data.py:292-351.
    """
    ds = cfg.dataset
    eventdir = os.path.join(datadir, "events")
    if ds in ("BeNeRF_Blender", "BeNeRF_Unreal"):
        ev = np.load(os.path.join(eventdir, "events.npy"))
        keep = (ev[:, 2] >= evt_ts_start) & (ev[:, 2] <= evt_ts_end)
        ev = ev[keep]
    elif ds == "E2NeRF_Real":
        import torch

        ev = torch.load(os.path.join(eventdir, "events.pt"),
                        map_location="cpu").numpy()
        keep = (ev[:, 2] >= evt_ts_start) & (ev[:, 2] <= evt_ts_end)
        ev = ev[keep]
    elif ds == "E2NeRF_Synthetic":
        path = os.path.join(eventdir, f"r_{cfg.index * 2}", "v2e-dvs-events.txt")
        txt = np.loadtxt(path)  # rows [t, x, y, p]
        ev = np.stack(
            [txt[:, 1], txt[:, 2], txt[:, 0] * 1e19, 2.0 * txt[:, 3] - 1.0],
            axis=-1,
        )  # load_data.py:308-317 (t scaled, p -> +-1)
    elif ds == "TUM_VIE":
        import h5py

        with h5py.File(os.path.join(eventdir, "events.h5"), "r") as f:
            g = f["events"]
            t = g["t"]
            # chunked range scan (the file can be huge), load_data.py:328-351
            chunk = 500_000
            parts = []
            for i in range(0, len(t), chunk):
                tt = t[i : i + chunk]
                sel = np.where((tt >= evt_ts_start) & (tt <= evt_ts_end))[0]
                if len(sel):
                    parts.append((i + sel[0], i + sel[-1] + 1))
            if not parts:
                raise ValueError("no events in range")
            lo = parts[0][0]
            hi = parts[-1][1]
            ev = np.stack(
                [g["x"][lo:hi], g["y"][lo:hi], g["t"][lo:hi], g["p"][lo:hi]],
                axis=-1,
            ).astype(np.float64)
        # 0 means negative polarity in TUM-VIE (model/nerf.py:194-196)
        ev[:, 3] = np.where(ev[:, 3] == 0, -1.0, ev[:, 3])
    else:
        raise ValueError(f"unknown dataset {ds!r}")
    return ev


def load_scene(datadir: str, cfg) -> SceneData:
    """Full scene load mirroring load_data() (load_data.py:262-388)."""
    datadir = os.path.expanduser(datadir)
    gray = cfg.channels == 1
    has_gt = cfg.dataset in ("BeNeRF_Blender", "BeNeRF_Unreal", "E2NeRF_Synthetic")

    image = _load_image_stack(datadir, "images", gray, cfg.index)
    imgtest = (
        _load_image_stack(datadir, "images_test", gray, cfg.index)
        if has_gt
        else None
    )

    img_s, img_e, evt_s, evt_e = load_timestamps(datadir, cfg)
    ev = load_events_raw(datadir, cfg, evt_s, evt_e)

    # sort by t and normalize ts to [0,1] (load_data.py:354-362) — one pass
    # through the native engine (csrc/events.cpp) when built
    event_arrays = events_mod.prepare_raw(
        ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3],
        width=cfg.event_width, t_lo=evt_s, t_hi=evt_e,
    )
    ev = ev[ev[:, 2].argsort()]
    ts_norm = (ev[:, 2] - evt_s) / (evt_e - evt_s)

    rgb_exp_ts = np.array(
        [(img_s - evt_s) / (evt_e - evt_s), (img_e - evt_s) / (evt_e - evt_s)],
        np.float32,
    )  # load_data.py:384-386

    poses = ev_poses = trans = None
    if cfg.loadpose:
        poses, ev_poses = _load_camera_poses(datadir, image.shape[1],
                                             image.shape[2],
                                             cubic="cubic" in cfg.model,
                                             index=cfg.index)
    elif cfg.loadtrans:
        trans = np.load(os.path.join(datadir, "trans.npy")).astype(np.float32)

    return SceneData(
        events=event_arrays,
        image=image,
        imgtest=imgtest,
        rgb_exp_ts=rgb_exp_ts,
        poses=poses,
        ev_poses=ev_poses,
        trans=trans,
        raw_events={"x": ev[:, 0], "y": ev[:, 1], "ts": ts_norm, "pol": ev[:, 3]},
    )


def _load_camera_poses(datadir, H, W, cubic, index):
    """poses_bounds(_events).npy loading + recentering (load_data.py:58-82,
    366-377). Off in all shipped configs; kept for capability parity."""
    suffix = "_cubic" if cubic else ""
    poses_arr = np.load(os.path.join(datadir, f"poses_bounds{suffix}.npy"))
    ev_arr = np.load(os.path.join(datadir, f"poses_bounds{suffix}_events.npy"))

    def unpack(arr):
        p = arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
        p[:2, 4, :] = np.array([H, W]).reshape([2, 1])
        p = np.concatenate([p[:, 1:2, :], -p[:, 0:1, :], p[:, 2:, :]], 1)
        return np.moveaxis(p, -1, 0).astype(np.float32)

    poses, ev_poses = unpack(poses_arr), unpack(ev_arr)
    n = 4 if cubic else 2
    both = np.concatenate(
        (poses[index : index + 2], ev_poses[index : index + 2]), axis=0
    )
    both = recenter_poses(both)
    return both[0:n], both[n : 2 * n]


def _poses_avg(poses):
    def normalize(v):
        return v / np.linalg.norm(v)

    center = poses[:, :3, 3].mean(0)
    vec2 = normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    m = np.stack([vec0, vec1, vec2, center], 1)
    hwf = poses[0, :3, -1:]
    return np.concatenate([m, hwf], 1)


def render_path_spiral(c2w, up, rads, focal, zrate, rots, N):
    """Spiral of render poses around an average pose (load_data.py:166-179)."""

    def normalize(v):
        return v / np.linalg.norm(v)

    def viewmatrix(z, up_, pos):
        vec2 = normalize(z)
        vec0 = normalize(np.cross(up_, vec2))
        vec1 = normalize(np.cross(vec2, vec0))
        return np.stack([vec0, vec1, vec2, pos], 1)

    out = []
    rads = np.array(list(rads) + [1.0])
    hwf = c2w[:, 4:5]
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        c = np.dot(
            c2w[:3, :4],
            np.array([np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0])
            * rads,
        )
        z = normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        out.append(np.concatenate([viewmatrix(z, up, c), hwf], 1))
    return np.array(out, np.float32)


def spherify_poses(poses, bds):
    """Rebase an inward-facing capture onto a sphere and emit a circular
    render path (load_data.py:194-260)."""

    def normalize(v):
        return v / np.linalg.norm(v)

    p34_to_44 = lambda p: np.concatenate(
        [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]), [p.shape[0], 1, 1])],
        1,
    )
    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    A_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
    b_i = -A_i @ rays_o
    center = np.squeeze(
        -np.linalg.inv((np.transpose(A_i, [0, 2, 1]) @ A_i).mean(0))
        @ b_i.mean(0)
    )
    up = (poses[:, :3, 3] - center).mean(0)

    vec0 = normalize(up)
    vec1 = normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))
    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc

    centroid = np.mean(poses_reset[:, :3, 3], 0)
    zh = centroid[2]
    radcircle = np.sqrt(max(rad**2 - zh**2, 1e-12))
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array(
            [radcircle * np.cos(th), radcircle * np.sin(th), zh]
        )
        up_ = np.array([0, 0, -1.0])
        vec2 = normalize(camorigin)
        vec0 = normalize(np.cross(vec2, up_))
        vec1 = normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses, 0)
    new_poses = np.concatenate(
        [new_poses, np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)],
        -1,
    )
    poses_reset = np.concatenate(
        [
            poses_reset[:, :3, :4],
            np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape),
        ],
        -1,
    )
    return poses_reset, new_poses, bds


def regenerate_pose(poses, bds, recenter=True, bd_factor=0.75, spherify=False,
                    path_zflat=False):
    """Build a render-path pose set from a captured pose bundle
    (load_data.py:390-439; unused by the reference drivers, kept for parity)."""
    if recenter:
        poses = recenter_poses(poses)
    if spherify:
        _, render_poses, _ = spherify_poses(poses, bds)
        return np.asarray(render_poses, np.float32)

    c2w = _poses_avg(poses)
    up = poses[:, :3, 1].sum(0)
    up = up / np.linalg.norm(up)
    close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
    dt = 0.75
    focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
    zdelta = close_depth * 0.2
    tt = poses[:, :3, 3]
    rads = np.percentile(np.abs(tt), 90, 0)
    N_views, N_rots = 120, 2
    if path_zflat:
        c2w[:3, 3] = c2w[:3, 3] + (-close_depth * 0.1) * c2w[:3, 2]
        rads[2] = 0.0
        N_rots = 1
        N_views //= 2
    return render_path_spiral(c2w, up, rads, focal, zrate=0.5, rots=N_rots,
                              N=N_views)


def recenter_poses(poses):
    """Rebase all poses around their average (load_data.py:181-192)."""
    poses_ = poses.copy()
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = _poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom_n = np.tile(bottom[None], [poses.shape[0], 1, 1])
    p44 = np.concatenate([poses[:, :3, :4], bottom_n], -2)
    fixed = np.linalg.inv(c2w) @ p44
    poses_[:, :3, :4] = fixed[:, :3, :4]
    return poses_
