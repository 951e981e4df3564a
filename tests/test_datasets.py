"""Loader coverage for the three dataset formats without end-to-end synthetic
scenes (E2NeRF_Synthetic / E2NeRF_Real / TUM_VIE), plus the fisheye undistort
LUT. Each fixture writes the exact on-disk layout the reference reads
(/root/reference/load_data.py:89-139,292-362) and asserts the normalization /
polarity / exposure invariants our SceneData contract promises."""

import os

import numpy as np
import pytest

from benerf_tpu.core.config import Config
from benerf_tpu.data import datasets, undistort


def _write_images(d, n, H=12, W=16, gt=False):
    from imageio.v3 import imwrite

    rng = np.random.default_rng(5)
    for sub in (["images", "images_test"] if gt else ["images"]):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
        for i in range(n):
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            imwrite(os.path.join(d, sub, f"{i:03d}.png"), img)


def _base_cfg(**kw):
    base = dict(
        index=0, channels=3, event_width=16, event_height=12,
        event_shift_start=0, event_shift_end=0,
    )
    base.update(kw)
    return Config(**base)


# --------------------------------------------------------------- E2NeRF_Syn


@pytest.fixture(scope="module")
def e2syn_dir(tmp_path_factory):
    """v2e text events: rows [t, x, y, p], t in SECONDS (float), p in {0,1};
    the loader must scale t by 1e19 and map p -> +-1 (load_data.py:308-317),
    with the exposure interval taken from the file's first/last event
    (load_data.py:112-119)."""
    d = str(tmp_path_factory.mktemp("e2syn"))
    _write_images(d, 2, gt=True)
    rng = np.random.default_rng(0)
    n = 500
    t = np.sort(rng.uniform(0.10, 0.55, n))
    x = rng.integers(0, 16, n)
    y = rng.integers(0, 12, n)
    p = rng.integers(0, 2, n)  # {0, 1} on disk
    evdir = os.path.join(d, "events", "r_0")  # index 0 -> r_{2*0}
    os.makedirs(evdir, exist_ok=True)
    np.savetxt(
        os.path.join(evdir, "v2e-dvs-events.txt"),
        np.stack([t, x, y, p], axis=-1),
        fmt="%.9f %d %d %d",
    )
    return d, {"t": t, "x": x, "y": y, "p": p}


def test_e2nerf_synthetic_loader(e2syn_dir):
    d, raw = e2syn_dir
    cfg = _base_cfg(dataset="E2NeRF_Synthetic")
    scene = datasets.load_scene(d, cfg)

    assert scene.events.num == len(raw["t"])
    ts = np.asarray(scene.events.ts)
    assert np.all(np.diff(ts) >= 0)
    assert ts.min() >= 0.0 and ts.max() <= 1.0
    # exposure == full event range for this format (first/last event)
    np.testing.assert_allclose(
        np.asarray(scene.rgb_exp_ts), [0.0, 1.0], atol=1e-6
    )
    # p in {0,1} on disk -> {-1,+1} in SceneData
    pol = np.asarray(scene.events.pol)
    assert set(np.unique(pol)) <= {-1.0, 1.0}
    order = np.argsort(raw["t"], kind="stable")
    np.testing.assert_array_equal(pol, 2.0 * raw["p"][order] - 1.0)
    # pixel flattening y*W + x survives the t*1e19 scale quirk
    np.testing.assert_array_equal(
        np.asarray(scene.events.pix_idx),
        (raw["y"][order] * 16 + raw["x"][order]).astype(np.int32),
    )
    # GT sharp frame exists for this format
    assert scene.imgtest is not None and scene.imgtest.shape == (1, 12, 16, 3)


# --------------------------------------------------------------- E2NeRF_Real


@pytest.fixture(scope="module")
def e2real_dir(tmp_path_factory):
    """torch-saved events.pt [x,y,t,p] + exposure_{start,end}_ts.txt
    (load_data.py:106-110,301-306). No GT sharp images."""
    torch = pytest.importorskip("torch")
    d = str(tmp_path_factory.mktemp("e2real"))
    _write_images(d, 2, gt=False)
    rng = np.random.default_rng(1)
    n = 400
    t = np.sort(rng.uniform(1000.0, 9000.0, n))
    ev = np.stack(
        [
            rng.integers(0, 16, n).astype(np.float64),
            rng.integers(0, 12, n).astype(np.float64),
            t,
            rng.choice([-1.0, 1.0], n),
        ],
        axis=-1,
    )
    os.makedirs(os.path.join(d, "events"), exist_ok=True)
    torch.save(torch.from_numpy(ev), os.path.join(d, "events", "events.pt"))
    np.savetxt(os.path.join(d, "exposure_start_ts.txt"), [3000.0, 6000.0])
    np.savetxt(os.path.join(d, "exposure_end_ts.txt"), [5000.0, 8000.0])
    return d, ev


def test_e2nerf_real_loader(e2real_dir):
    d, ev = e2real_dir
    # 1s shifts (config is in ms-style units scaled by 1e3, load_data.py:129-137)
    cfg = _base_cfg(dataset="E2NeRF_Real", event_shift_start=1,
                    event_shift_end=1)
    scene = datasets.load_scene(d, cfg)

    evt_s, evt_e = 3000.0 - 1e3, 5000.0 + 1e3
    expected = ev[(ev[:, 2] >= evt_s) & (ev[:, 2] <= evt_e)]
    assert scene.events.num == len(expected)
    ts = np.asarray(scene.events.ts)
    assert np.all(np.diff(ts) >= 0) and ts.min() >= 0 and ts.max() <= 1
    # exposure maps strictly inside (0,1) because of the shifts
    lo, hi = np.asarray(scene.rgb_exp_ts)
    np.testing.assert_allclose(
        [lo, hi],
        [(3000.0 - evt_s) / (evt_e - evt_s), (5000.0 - evt_s) / (evt_e - evt_s)],
        atol=1e-6,
    )
    assert 0.0 < lo < hi < 1.0
    assert scene.imgtest is None  # no GT for real captures
    # second image picks the second exposure row
    cfg1 = _base_cfg(dataset="E2NeRF_Real", index=1)
    scene1 = datasets.load_scene(d, cfg1)
    assert scene1.events.num == int(
        ((ev[:, 2] >= 6000.0) & (ev[:, 2] <= 8000.0)).sum()
    )


# ------------------------------------------------------------------ TUM_VIE


@pytest.fixture(scope="module")
def tumvie_dir(tmp_path_factory):
    """Chunked h5 events group {x,y,t,p} with p in {0,1} (0 == negative,
    model/nerf.py:194-196) + image_timestamps/exposures (load_data.py:98-104,
    319-351)."""
    h5py = pytest.importorskip("h5py")
    d = str(tmp_path_factory.mktemp("tumvie"))
    _write_images(d, 2, gt=False)
    rng = np.random.default_rng(2)
    n = 600
    t = np.sort(rng.uniform(0, 1_000_000, n))  # us
    x = rng.integers(0, 16, n)
    y = rng.integers(0, 12, n)
    p = rng.integers(0, 2, n)
    os.makedirs(os.path.join(d, "events"), exist_ok=True)
    with h5py.File(os.path.join(d, "events", "events.h5"), "w") as f:
        g = f.create_group("events")
        g.create_dataset("x", data=x)
        g.create_dataset("y", data=y)
        g.create_dataset("t", data=t)
        g.create_dataset("p", data=p)
    np.savetxt(os.path.join(d, "image_timestamps.txt"), [400_000.0, 700_000.0])
    np.savetxt(os.path.join(d, "image_exposures.txt"), [100_000.0, 100_000.0])
    return d, {"t": t, "x": x, "y": y, "p": p}


def test_tum_vie_loader(tumvie_dir):
    d, raw = tumvie_dir
    cfg = _base_cfg(dataset="TUM_VIE")
    scene = datasets.load_scene(d, cfg)

    # exposure = stamp +- half exposure
    evt_s, evt_e = 350_000.0, 450_000.0
    keep = (raw["t"] >= evt_s) & (raw["t"] <= evt_e)
    assert scene.events.num == int(keep.sum())
    # polarity 0 -> -1 remap
    pol = np.asarray(scene.events.pol)
    assert set(np.unique(pol)) <= {-1.0, 1.0}
    expect_pol = np.where(raw["p"][keep] == 0, -1.0, raw["p"][keep])
    np.testing.assert_array_equal(np.sort(pol), np.sort(expect_pol))
    np.testing.assert_allclose(np.asarray(scene.rgb_exp_ts), [0.0, 1.0],
                               atol=1e-6)
    assert scene.imgtest is None


# ------------------------------------------------------------- undistort LUT


def test_undistort_newton_matches_opencv():
    """The pure-numpy Newton inversion must agree with cv2.fisheye on a real
    Kannala-Brandt coefficient set (undistort.py:6-87 contract)."""
    pytest.importorskip("cv2")
    K = np.array([[320.0, 0, 64.0], [0, 320.0, 48.0], [0, 0, 1.0]])
    D = np.array([-0.05, 0.01, -0.002, 0.0005])
    ours = undistort.undistort_lut(128, 96, K, D, use_opencv=False)
    cv = undistort.undistort_lut(128, 96, K, D, use_opencv=True)
    # Bit-compat check the reference code promises but never ran: sub-0.01px
    # agreement everywhere on the sensor
    assert np.max(np.abs(ours - cv)) < 1e-2


def test_undistort_equidistant_base_model():
    """With zero polynomial coefficients Kannala-Brandt is the pure
    equidistant model: r_px = f*theta, so the undistorted (perspective)
    radius is f*tan(theta) — fixed at the principal point, radially
    symmetric, and strictly spreading outward."""
    K = np.array([[50.0, 0, 8.0], [0, 50.0, 6.0], [0, 0, 1.0]])
    lut = undistort.undistort_lut(16, 12, K, np.zeros(4), use_opencv=False)
    np.testing.assert_allclose(lut[6, 8], [8.0, 6.0], atol=1e-4)
    xs, ys = np.meshgrid(np.arange(16), np.arange(12))
    r_d = np.hypot(xs - 8.0, ys - 6.0) / 50.0  # theta (radians)
    r_u = np.hypot(lut[..., 0] - 8.0, lut[..., 1] - 6.0) / 50.0
    np.testing.assert_allclose(r_u, np.tan(r_d), atol=1e-4)


def test_tum_vie_remap_luts_built_from_config():
    cfg = _base_cfg(
        dataset="TUM_VIE",
        rgb_fx=100.0, rgb_fy=100.0, rgb_cx=8.0, rgb_cy=6.0,
        rgb_width=16, rgb_height=12,
        event_fx=100.0, event_fy=100.0, event_cx=8.0, event_cy=6.0,
        rgb_dist=[-0.02, 0.0, 0.0, 0.0], event_dist=[-0.02, 0.0, 0.0, 0.0],
    )
    img, evt = undistort.luts_for_config(cfg)
    assert img.shape == (12, 16, 2) and evt.shape == (12, 16, 2)
    assert np.all(np.isfinite(img)) and np.all(np.isfinite(evt))
