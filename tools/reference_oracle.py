"""Run the PyTorch reference (read-only oracle at /root/reference) on a scene
exported by benerf_tpu.data.synthetic, and score its recovered trajectory with
the SAME gauge-fixed reprojection-flow metric used for our framework
(eval/pose_metrics.reproj_flow_error).

Purpose (VERDICT r3 task 1): the r3 quality run showed our optimizer does not
recover the trajectory on the bundled synthetic scene. Loss AND gradient
parity to the reference are already test-verified (tests/test_golden_grad.py),
so the open question is whether the *scene/protocol* is recoverable at all.
This driver answers it by training the reference verbatim — its own train()
loop, losses, LR decay, and optimizers (/root/reference/train.py:20-461) —
on the exported scene. If the reference fails identically, the testbed is at
fault and the scene must change; if it succeeds, our optimization diverges
from parity somewhere outside the per-step math.

Only non-semantic shims are applied (the container has no GPU/wandb/lpips/
numba): the CUDA sparse scatter is replaced by an equivalent CPU scatter, the
wandb logger by an in-memory recorder, LPIPS by 0.0, and per-eval full-frame
rendering is restricted to the mid-exposure frame (the only one train.py
scores). Nothing on the gradient path is altered.

Usage:
    python tools/reference_oracle.py --workdir /tmp/oracle --iters 4000 \
        --target_blur_px 6.0 --out ORACLE_r04.json
"""

import argparse
import glob
import json
import os
import sys
import time
import types

os.environ["JAX_PLATFORMS"] = "cpu"  # never grab the TPU from this process

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _stub_modules():
    """Make the reference importable without numba/wandb/lpips/CUDA."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")
        wandb.init = lambda **k: types.SimpleNamespace(
            log=lambda *a, **kw: None, finish=lambda: None
        )
        wandb.Image = lambda *a, **k: None
        sys.modules["wandb"] = wandb
    if "hdf5plugin" not in sys.modules:  # only needed for TUM_VIE h5 files
        sys.modules["hdf5plugin"] = types.ModuleType("hdf5plugin")
    if "configargparse" not in sys.modules:  # config_parser is never called
        sys.modules["configargparse"] = types.ModuleType("configargparse")
    if "skimage" not in sys.modules:
        # import placeholder only: the driver replaces compute_img_metric
        # wholesale (skimage/lpips are absent from this container)
        skimage = types.ModuleType("skimage")
        sk_metrics = types.ModuleType("skimage.metrics")
        for name in ("mean_squared_error", "structural_similarity",
                     "peak_signal_noise_ratio"):
            setattr(sk_metrics, name, None)
        skimage.metrics = sk_metrics
        sys.modules["skimage"] = skimage
        sys.modules["skimage.metrics"] = sk_metrics
    if "lpips" not in sys.modules:
        lpips = types.ModuleType("lpips")
        lpips_sub = types.ModuleType("lpips.lpips")

        class _LPIPS:
            def __init__(self, *a, **k):
                pass

            def cpu(self):
                return self

            def to(self, *a, **k):
                return self

            def __call__(self, *a, **k):
                import torch

                return torch.zeros(1)

        lpips.LPIPS = _LPIPS
        lpips_sub.LPIPS = _LPIPS
        lpips.lpips = lpips_sub
        sys.modules["lpips"] = lpips
        sys.modules["lpips.lpips"] = lpips_sub


class Recorder:
    """WandbLogger-compatible in-memory scalar recorder
    (logger/wandb_logger.py:9-29 interface)."""

    def __init__(self, args):
        self.buffer = {}
        self.records = []

    def write(self, label, value):
        try:
            value = float(value)
        except (TypeError, ValueError):
            return
        self.buffer[label] = value

    def write_img(self, *a, **k):
        pass

    def write_imgs(self, *a, **k):
        pass

    def update_buffer(self):
        if self.buffer:
            self.records.append(dict(self.buffer))
        self.buffer = {}


def build_args(datadir, logdir, H, W, focal, iters, evals, n_evt_rays,
               n_rgb_rays, n_samples, n_importance, seed=0):
    """Reference flag surface (config.py:3-228) for the exported scene."""
    eval_iter = max(1, iters // max(evals, 1))
    return types.SimpleNamespace(
        device=0, debug=False, seed=seed, config=None, project="oracle",
        expname="0", datadir=datadir, logdir=logdir,
        dataset="BeNeRF_Blender", index=0, viewer="none", depth=False,
        model="benerf", load_checkpoint=False, loadpose=False,
        loadtrans=False, traj="spline", num_interpolated_pose=19,
        use_barf_c2f=False, barf_c2f_start=0.1, barf_c2f_end=0.5,
        netdepth=8, netwidth=256, netdepth_fine=8, netwidth_fine=256,
        rgb_crf_net_hidden=0, rgb_crf_net_width=128,
        event_crf_net_hidden=0, event_crf_net_width=128,
        chunk=4096, netchunk=32768, channels=3,
        sampling_event_rays=n_evt_rays, sampling_rgb_rays=n_rgb_rays,
        N_samples=n_samples, N_importance=n_importance,
        perturb=1.0, use_viewdirs=True, i_embed=0, multires=10,
        multires_views=4, raw_noise_std=0.0,
        render_images=False, render_video=False, extract_poses=False,
        checkpoint=iters, num_render_images=19, num_extract_poses=19,
        ndc=True, render_height=0, render_width=0, render_fx=0.0,
        render_fy=0.0, render_cx=0.0, render_cy=0.0,
        optimize_nerf=True, optimize_pose=True, optimize_trans=False,
        optimize_rgb_crf=False, optimize_event_crf=False,
        lrate=5e-4, pose_lrate=5e-4, transform_lrate=1e-6,
        rgb_crf_lrate=5e-4, event_crf_lrate=5e-4,
        decay_rate=0.1, decay_rate_pose=0.1, decay_rate_transform=0.01,
        decay_rate_rgb_crf=0.1, decay_rate_event_crf=0.1, lrate_decay=200,
        rgb_fx=focal, rgb_fy=focal, rgb_cx=W / 2, rgb_cy=H / 2,
        rgb_width=W, rgb_height=H, rgb_dist=[0.0, 0.0, 0.0, 0.0],
        event_fx=focal, event_fy=focal, event_cx=W / 2, event_cy=H / 2,
        event_width=W, event_height=H, event_dist=[0.0, 0.0, 0.0, 0.0],
        event_threshold=0.1, event_shift_start=0, event_shift_end=0,
        accumulate_time_length=0.1, random_sampling_window=True,
        event_time_window=True,
        max_iter=iters, console_log_iter=min(200, eval_iter),
        render_image_iter=eval_iter, save_model_iter=iters,
        render_video_iter=10 * iters,
        rgb_loss=True, event_loss=True, event_coeff_syn=0.1,
        event_coeff_real=2.0, rgb_coeff=1.0,
    )


def load_kitti_poses(path):
    rows = np.loadtxt(path)
    return rows.reshape(-1, 3, 4)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--evals", type=int, default=4)
    p.add_argument("--size", type=int, default=80)
    p.add_argument("--focal", type=float, default=90.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--target_blur_px", type=float, default=6.0)
    p.add_argument("--event_rays", type=int, default=240)
    p.add_argument("--rgb_rays", type=int, default=247)  # 13 per pose
    p.add_argument("--n_samples", type=int, default=32)
    p.add_argument("--n_importance", type=int, default=32)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    sys.path.insert(0, REPO)
    # the axon TPU plugin's sitecustomize overrides jax_platforms at import
    # time; force CPU again post-import (this process must never contend for
    # the chip — TPU diagnostics run concurrently)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from benerf_tpu.data import synthetic
    from benerf_tpu.eval import pose_metrics

    H = W = args.size
    datadir = os.path.join(args.workdir, "data")
    logdir = os.path.join(args.workdir, "logs")
    if not os.path.exists(os.path.join(datadir, "poses_ts.txt")):
        synthetic.write_benerf_blender_scene(
            datadir, H=H, W=W, focal=args.focal, seed=args.seed, n_images=1,
            target_blur_px=args.target_blur_px,
        )
    gt = np.load(os.path.join(datadir, "gt_trajectory.npz"))
    gt_knots, plane_depth = gt["knots"], float(gt["plane_depth"])

    import torch

    torch.set_num_threads(int(os.environ.get("ORACLE_THREADS", "0"))
                          or os.cpu_count() or 8)
    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    _stub_modules()
    sys.path.insert(0, REF)
    os.chdir(REF)  # reference modules use relative imports/paths

    from utils import event_utils

    def accumulate_events_cpu(out, xs, ys, ps):
        """CPU-equivalent of accumulate_events_on_gpu
        (utils/event_utils.py:246-259): same sparse-COO scatter, no .to('cuda')."""
        idx = torch.tensor(np.array([ys, xs]), dtype=torch.long)
        vals = torch.tensor(ps, dtype=torch.float32)
        sp = torch.sparse_coo_tensor(idx, vals, torch.Size(out.shape))
        return torch.from_numpy(out).float() + sp.to_dense()

    event_utils.accumulate_events_on_gpu = accumulate_events_cpu

    import train as ref_train
    from run_nerf_helpers import render_image_test as real_render_image_test

    recorder_box = []

    def make_recorder(a):
        r = Recorder(a)
        recorder_box.append(r)
        return r

    ref_train.WandbLogger = make_recorder

    from benerf_tpu.eval import metrics as our_metrics

    def metric_no_lpips(im1, im2, metric):
        # native psnr/ssim on the [0,1] domain (the reference's skimage path
        # maps to [-1,1] first — a documented quirk; these curve values are
        # informational, the oracle's deliverable is the pose dumps)
        if metric == "lpips":
            return 0.0
        a = np.asarray(im1.detach().cpu() if hasattr(im1, "detach") else im1,
                       np.float64).squeeze()
        b = np.asarray(im2.detach().cpu() if hasattr(im2, "detach") else im2,
                       np.float64).squeeze()
        if metric == "psnr":
            return our_metrics.psnr(a, b)
        if metric == "ssim":
            return our_metrics.ssim(a, b)
        return float(np.mean((a - b) ** 2))

    ref_train.compute_img_metric = metric_no_lpips

    def render_mid_only(i, graph, poses, H_r, W_r, K_r, a, ld, remap, **kw):
        # train.py only scores imgs[len//2]; rendering the other 18 frames
        # is pure CPU cost. Pose dumps (the oracle's deliverable) happen
        # before this call and are unaffected.
        mid = poses[len(poses) // 2][None]
        return real_render_image_test(i, graph, mid, H_r, W_r, K_r, a, ld,
                                      remap, **kw)

    ref_train.render_image_test = render_mid_only

    ref_args = build_args(
        datadir, logdir, H, W, args.focal, args.iters, args.evals,
        args.event_rays, args.rgb_rays, args.n_samples, args.n_importance,
        seed=args.seed,
    )

    t0 = time.time()
    ref_train.train(ref_args)
    wall = time.time() - t0

    # score every dumped trajectory with our flow metric
    from benerf_tpu.geometry import spline as spline_mod
    import jax.numpy as jnp

    K = np.array([[args.focal, 0, W / 2], [0, args.focal, H / 2], [0, 0, 1]])
    pose_dir = os.path.join(logdir, "0", "poses_test")
    checkpoints = []
    n = ref_args.num_interpolated_pose
    gt_poses = np.asarray(
        spline_mod.cubic_bspline_pose(
            jnp.asarray(gt_knots), jnp.linspace(0.0, 1.0, n)
        )
    )
    for path in sorted(glob.glob(os.path.join(pose_dir, "poses_test_*.txt"))):
        step = int(os.path.basename(path)[11:-4])
        est = load_kitti_poses(path)
        fl = pose_metrics.reproj_flow_error(est, gt_poses, K, plane_depth, H, W)
        rec = {
            "step": step,
            "pose_ate_rmse": pose_metrics.ate_rmse(est, gt_poses),
            "pose_flow_rmse_px": fl["flow_rmse_px"],
            "gt_flow_rms_px": fl["gt_flow_rms_px"],
        }
        checkpoints.append(rec)

    # init-trajectory baseline: torch init is U(0, 0.01)*rand knots
    # (model/optimize.py:22-24) — an effectively-constant trajectory
    rng = np.random.default_rng(0)
    init_knots = (rng.random((4, 6)) * 0.01).astype(np.float32)
    init_poses = np.asarray(
        spline_mod.cubic_bspline_pose(
            jnp.asarray(init_knots), jnp.linspace(0.0, 1.0, n)
        )
    )
    fl0 = pose_metrics.reproj_flow_error(
        init_poses, gt_poses, K, plane_depth, H, W
    )

    psnr_curve = [
        {k: r[k] for k in ("test_mid_psnr", "test_mid_ssim") if k in r}
        for r in (recorder_box[0].records if recorder_box else [])
        if "test_mid_psnr" in r
    ]

    final = checkpoints[-1] if checkpoints else {}
    artifact = {
        "oracle": "pytorch reference /root/reference train() verbatim (CPU)",
        "scene": {"kind": "synthetic_benerf_blender", "H": H, "W": W,
                  "seed": args.seed, "target_blur_px": args.target_blur_px},
        "config": {"iters": args.iters, "event_rays": args.event_rays,
                   "rgb_rays": args.rgb_rays, "N_samples": args.n_samples,
                   "N_importance": args.n_importance},
        "baseline": {"init_pose_flow_rmse_px": fl0["flow_rmse_px"],
                     "gt_flow_rms_px": fl0["gt_flow_rms_px"]},
        "checkpoints": checkpoints,
        "psnr_curve": psnr_curve,
        "passed": {
            "pose_flow_improves": bool(
                final.get("pose_flow_rmse_px", np.inf)
                < fl0["flow_rmse_px"] * 0.75
            ),
        },
        "wall_s": round(wall, 1),
    }
    text = json.dumps(artifact, indent=2)
    print(text)
    if args.out:
        out = args.out if os.path.isabs(args.out) else os.path.join(REPO, args.out)
        with open(out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
