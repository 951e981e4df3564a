"""Inference CLI: load a checkpoint, extract poses / render images / video.

Reference-compatible (test.py:14-135 + README.md:104-129):
    python -m benerf_tpu.cli.test --config cfg.txt --index 0 \
        --extract_poses True --render_images True --render_video True

Loads this framework's .ckpt.npz checkpoints; also imports the reference's
torch .tar checkpoints when pointed at one (weights converted via
models/torch_compat — optimizer states are not imported across frameworks).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from benerf_tpu.core.config import config_from_cli
from benerf_tpu.eval import frames as frames_mod
from benerf_tpu.eval import io as io_mod
from benerf_tpu.geometry import spline as spline_mod
from benerf_tpu.render import renderer as renderer_mod
from benerf_tpu.train import checkpoint as ckpt_mod
from benerf_tpu.train import step as step_mod
from benerf_tpu.train.loop import intrinsics


def load_params(cfg, logdir):
    """Checkpoint -> (params, global_step).

    Selection: the requested cfg.checkpoint if that file exists (either our
    .ckpt.npz or a reference .tar import); otherwise fall back to the latest
    available checkpoint with a warning (the reference's test.py:96-107 hard
    errors on a missing step — here partial runs remain inspectable).
    """
    tar = os.path.join(logdir, f"{cfg.checkpoint:06d}.tar")
    if os.path.exists(tar):
        return _params_from_torch_tar(cfg, tar)
    template = step_mod.init_state(cfg, jax.random.PRNGKey(cfg.seed))
    step = None
    requested = os.path.join(logdir, f"{cfg.checkpoint:06d}.ckpt.npz")
    if os.path.exists(requested):
        step = cfg.checkpoint
    else:
        latest = ckpt_mod.latest_step(logdir)
        if latest is not None and latest != cfg.checkpoint:
            print(
                f"[WARN] checkpoint {cfg.checkpoint} not found under {logdir};"
                f" falling back to latest ({latest})"
            )
            step = latest
    state = ckpt_mod.restore(logdir, template, step=step)
    return state.params, int(state.step)


def _params_from_torch_tar(cfg, path):
    """Import a reference .tar checkpoint (test.py:98-107 layout)."""
    import torch

    from benerf_tpu.models import torch_compat

    ckpt = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in ckpt["graph"].items()}
    params = step_mod.build_params(cfg, jax.random.PRNGKey(cfg.seed))
    params["nerf"] = torch_compat.nerf_params_from_state_dict(sd, "nerf.")
    params["nerf_fine"] = torch_compat.nerf_params_from_state_dict(
        sd, "nerf_fine."
    )
    import jax.numpy as jnp

    params["knots"] = jnp.asarray(sd["evt_knot_pose_se3.params.weight"])
    params["transform"] = jnp.asarray(sd["transform.params.weight"][0])
    # CRF tone mappers (component.py:38-149) ride along when present so
    # optimize_rgb_crf / optimize_event_crf runs import losslessly.
    if any(k.startswith("rgb_crf.mlp_gray.") for k in sd):
        params["rgb_crf"] = torch_compat.crf_params_from_state_dict(
            sd, "rgb_crf.mlp_gray."
        )
    if any(k.startswith("event_crf.mlp_luminance.") for k in sd):
        params["event_crf"] = torch_compat.crf_params_from_state_dict(
            sd, "event_crf.mlp_luminance."
        )
    return params, int(ckpt["global_step"])


def pose_trajectory(params, cfg, seg_num):
    """get_pose_rgb over the FULL unit interval (test.py:111-130 uses [0,1])."""
    knots = params["knots"] + params["transform"][None, :]
    return np.asarray(
        spline_mod.interpolate_poses(knots, 0.0, 1.0, seg_num, cfg.traj)
    )


def main(argv=None):
    cfg = config_from_cli(argv)
    logdir = os.path.join(os.path.expanduser(cfg.logdir), str(cfg.index))
    testdir = os.path.join(logdir, "test_results")
    os.makedirs(testdir, exist_ok=True)

    params, global_step = load_params(cfg, logdir)
    print(f"[INFO] loaded checkpoint at step {global_step}")

    K_rgb, K_evt, K_render, H_r, W_r = intrinsics(cfg)
    if H_r is None:
        H_r, W_r = int(cfg.rgb_height), int(cfg.rgb_width)
    settings = renderer_mod.RenderSettings.from_config(cfg)

    if cfg.extract_poses and global_step > 0:
        poses = pose_trajectory(params, cfg, cfg.num_extract_poses)
        io_mod.save_poses_kitti(global_step, testdir, poses)
        print("[INFO] extracted poses")

    if cfg.render_images and global_step > 0:
        poses = pose_trajectory(params, cfg, cfg.num_render_images)
        img_dir = os.path.join(testdir, "image_test",
                               f"img_test_{global_step:06d}")
        for j, fr in enumerate(
            frames_mod.render_trajectory(params, poses, K_render, H_r, W_r,
                                         settings, chunk=cfg.chunk)
        ):
            io_mod.save_image(os.path.join(img_dir, f"test{j:03d}.png"),
                              fr["rgb"], gray=cfg.channels == 1)
            if cfg.depth:
                disp = fr["disp"] / max(fr["disp"].max(), 1e-9)
                io_mod.save_image(
                    os.path.join(img_dir, f"depth_{j:03d}.png"), disp
                )
        print("[INFO] rendered images")

    if cfg.render_video and global_step > 0:
        poses = pose_trajectory(params, cfg, 90)
        frames = [
            fr["rgb"]
            for fr in frames_mod.render_trajectory(
                params, poses, K_render, H_r, W_r, settings, chunk=cfg.chunk
            )
        ]
        io_mod.save_video(
            os.path.join(testdir, f"{cfg.index}_spiral_{global_step:06d}_rgb.mp4"),
            frames,
        )
        print("[INFO] rendered video")


if __name__ == "__main__":
    main()
