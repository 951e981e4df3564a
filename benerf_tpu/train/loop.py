"""Training driver: the full BeNeRF run (load -> train -> eval -> checkpoint).

Mirrors the reference train() control flow (/root/reference/train.py:20-461)
with TPU-native internals: one jitted step, device-resident scene data,
JSONL(+wandb) logging, working checkpoint resume, and first-class throughput
accounting (rays/s; absent from the reference, SURVEY.md §5).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from benerf_tpu.core import rng as rng_mod
from benerf_tpu.data import datasets, undistort
from benerf_tpu.data import events as events_util
from benerf_tpu.eval import frames as frames_mod
from benerf_tpu.eval import io as io_mod
from benerf_tpu.eval import metrics as metrics_mod
from benerf_tpu.geometry import spline as spline_mod
from benerf_tpu.parallel import mesh as mesh_mod
from benerf_tpu.render import renderer as renderer_mod
from benerf_tpu.train import checkpoint as ckpt_mod
from benerf_tpu.train import optim as optim_mod
from benerf_tpu.train import step as step_mod


def intrinsics(cfg):
    """K_rgb, K_evt, (K_render, H_render, W_render) per train.py:76-102."""
    K_rgb = np.array(
        [[cfg.rgb_fx, 0, cfg.rgb_cx], [0, cfg.rgb_fy, cfg.rgb_cy], [0, 0, 1]],
        np.float32,
    )
    K_evt = np.array(
        [[cfg.event_fx, 0, cfg.event_cx], [0, cfg.event_fy, cfg.event_cy],
         [0, 0, 1]],
        np.float32,
    )
    if cfg.render_height == 0 and cfg.render_width == 0:
        K_render, H_r, W_r = K_rgb, None, None  # fall back to image dims
    else:
        K_render = np.array(
            [[cfg.render_fx, 0, cfg.render_cx],
             [0, cfg.render_fy, cfg.render_cy], [0, 0, 1]], np.float32
        )
        H_r, W_r = cfg.render_height, cfg.render_width
    return K_rgb, K_evt, K_render, H_r, W_r


def make_batch(scene: datasets.SceneData, cfg, K_rgb, K_evt,
               img_remap=None, evt_remap=None) -> step_mod.SceneBatch:
    H, W, C = scene.image.shape[1:4]
    return step_mod.SceneBatch(
        events=scene.events,
        image_flat=jnp.asarray(scene.image.reshape(H * W, C), jnp.float32),
        rgb_exp_ts=jnp.asarray(scene.rgb_exp_ts, jnp.float32),
        K_rgb=jnp.asarray(K_rgb),
        K_evt=jnp.asarray(K_evt),
        img_remap=None if img_remap is None else jnp.asarray(
            img_remap.reshape(-1, 2)),
        evt_remap=None if evt_remap is None else jnp.asarray(
            evt_remap.reshape(-1, 2)),
    )


def rgb_pose_trajectory(params, cfg, rgb_exp_ts, seg_num):
    """get_pose_rgb equivalent (model/optimize.py:84-111)."""
    knots = params["knots"] + params["transform"][None, :]
    return np.asarray(
        spline_mod.interpolate_poses(
            knots, float(rgb_exp_ts[0]), float(rgb_exp_ts[1]), seg_num,
            cfg.traj,
        )
    )


def _write_run_config(cfg, logdir):
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "args.txt"), "w") as f:
        for k in sorted(vars(cfg)):
            f.write(f"{k} = {getattr(cfg, k)}\n")
    if cfg.config and os.path.exists(cfg.config):
        with open(cfg.config) as src, open(
            os.path.join(logdir, "config.txt"), "w"
        ) as dst:
            dst.write(src.read())


def periodic_eval(params, cfg, scene, settings_eval, K_render, H_r, W_r,
                  logdir, step, logger):
    """Render n_interp frames along the recovered trajectory; PSNR/SSIM/LPIPS
    of the middle frame vs the sharp GT (train.py:403-430)."""
    poses = rgb_pose_trajectory(params, cfg, scene.rgb_exp_ts,
                                cfg.num_interpolated_pose)
    io_mod.save_poses_kitti(step, logdir, poses)

    imgs = []
    img_dir = os.path.join(logdir, "images_test", f"img_test_{step:06d}")
    for j, fr in enumerate(
        frames_mod.render_trajectory(
            params, poses, K_render, H_r, W_r, settings_eval, chunk=cfg.chunk,
            key=jax.random.PRNGKey(cfg.seed + step),
            deterministic=not cfg.sigma_noise_eval,
        )
    ):
        io_mod.save_image(
            os.path.join(img_dir, f"test{j:03d}.png"), fr["rgb"],
            gray=cfg.channels == 1,
        )
        if cfg.depth:
            disp = fr["disp"] / max(fr["disp"].max(), 1e-9)
            io_mod.save_image(os.path.join(img_dir, f"depth_{j:03d}.png"), disp)
        imgs.append(fr["rgb"])

    results = {}
    if scene.imgtest is not None:
        mid = imgs[len(imgs) // 2]
        gt = scene.imgtest[0]
        results["test_mid_psnr"] = metrics_mod.psnr(mid, gt)
        results["test_mid_ssim"] = metrics_mod.ssim(mid, gt)
        lp = metrics_mod.lpips(mid, gt)
        if lp is not None:
            results["test_mid_lpips"] = lp
        logger.write_img("test_mid_img", mid, step)
    if getattr(scene, "gt_knots", None) is not None:
        # joint-recovery pose accuracy vs the generator's ground-truth
        # trajectory (only synthetic scenes carry gt_knots); the reference
        # has no in-train pose metric — this closes the loop on the paper's
        # actual deliverable, the recovered trajectory.
        from benerf_tpu.eval import pose_metrics

        gt_us = (
            scene.gt_exp_us
            if scene.gt_exp_us is not None
            else scene.rgb_exp_ts
        )
        gt_poses = np.asarray(
            spline_mod.interpolate_poses(
                jnp.asarray(scene.gt_knots), float(gt_us[0]),
                float(gt_us[1]), len(poses), cfg.traj,
            )
        )
        results["pose_ate_rmse"] = pose_metrics.ate_rmse(poses, gt_poses)
        r = pose_metrics.rpe(poses, gt_poses)
        results["pose_rpe_trans"] = r["trans_rmse"]
        results["pose_rpe_rot_deg"] = r["rot_rmse_deg"]
        if scene.gt_plane_depth is not None:
            # the headline recovery metric: pixel-space motion error of the
            # recovered trajectory (gauge-fixed at mid-exposure) — see
            # eval/pose_metrics.reproj_flow_error
            fl = pose_metrics.reproj_flow_error(
                poses, gt_poses, K_render, scene.gt_plane_depth, H_r, W_r
            )
            results["pose_flow_rmse_px"] = fl["flow_rmse_px"]
            results["gt_flow_rms_px"] = fl["gt_flow_rms_px"]
    for k, v in results.items():
        logger.write(k, v)
    return imgs, results


def train(cfg, scene: datasets.SceneData = None, init_knots=None):
    """Run a full training; returns the final TrainState.

    init_knots: optional (4,6) se(3) knot override for the trajectory init
    (diagnostics: start at/near the GT trajectory to probe whether it is a
    fixed point of the joint optimization). Default = reference init
    (U(0,0.01), model/optimize.py:22-24) or scene.ev_poses under loadpose.
    """
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    mesh_mod.initialize_distributed()
    mesh = mesh_mod.make_mesh(cfg.mesh_devices)

    logdir = os.path.join(os.path.expanduser(cfg.logdir), str(cfg.index))
    _write_run_config(cfg, logdir)
    logger = io_mod.JsonlLogger(
        cfg.log_file or os.path.join(logdir, "metrics.jsonl"),
        wandb_project=cfg.project if cfg.viewer == "wandb" else None,
        config=vars(cfg),
    )

    if scene is None:
        scene = datasets.load_scene(cfg.datadir, cfg)
    H, W = scene.image.shape[1:3]

    K_rgb, K_evt, K_render, H_r, W_r = intrinsics(cfg)
    if H_r is None:
        H_r, W_r = H, W
    img_remap, evt_remap = undistort.luts_for_config(cfg)
    batch = make_batch(scene, cfg, K_rgb, K_evt, img_remap, evt_remap)

    tx = optim_mod.build_optimizer(cfg)
    if init_knots is None and cfg.loadpose:
        init_knots = scene.ev_poses
    if init_knots is None and cfg.pose_init == "motion_scale":
        from benerf_tpu.train import pose_init as pose_init_mod

        init_knots, d_px = pose_init_mod.initial_knots(cfg, scene)
        print(f"[INFO] motion-scale pose init: estimated apparent motion "
              f"{d_px:.2f}px -> mean |knot| {np.abs(init_knots).mean():.4f}")
    state = step_mod.init_state(
        cfg, jax.random.PRNGKey(cfg.seed), tx=tx,
        init_knots=init_knots,
        init_transform=scene.trans if cfg.loadtrans else None,
    )
    if cfg.load_checkpoint and ckpt_mod.latest_step(logdir) is not None:
        state = ckpt_mod.restore(logdir, state)
        print(f"[INFO] resumed from step {int(state.step)}")
    if mesh is not None:
        state = mesh_mod.replicate_tree(state, mesh)

    settings_eval = renderer_mod.RenderSettings.from_config(cfg)
    root_key = rng_mod.root_key(cfg.seed)

    # device-side multi-step: scan `g` iterations per dispatch, where g is the
    # largest chunk that respects every periodic-event boundary.
    import math

    g = math.gcd(
        math.gcd(cfg.console_log_iter, cfg.render_image_iter),
        math.gcd(cfg.render_video_iter, cfg.save_model_iter),
    )
    g = max(1, min(g, cfg.max_iter))
    if cfg.event_time_window and cfg.event_window_cap == 0:
        import dataclasses

        cap = events_util.window_cap(
            np.asarray(scene.events.ts), cfg.accumulate_time_length
        )
        cfg = dataclasses.replace(cfg, event_window_cap=cap)
        print(f"[INFO] event window cap: {cap} of {scene.events.num} events")
    step_fn = step_mod.make_train_step(cfg, H, W, mesh=mesh, tx=tx)
    multi_fn = (
        step_mod.make_multi_step(cfg, H, W, g, mesh=mesh, tx=tx)
        if g > 1
        else None
    )

    rays_per_iter = (
        2 * cfg.sampling_event_rays
        + cfg.num_interpolated_pose
        * (cfg.sampling_rgb_rays // cfg.num_interpolated_pose)
    )

    start = int(state.step)
    t_last = time.time()
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        i = start
        tracing = False
        while i < cfg.max_iter:
            if (
                cfg.profile_iter > 0
                and not tracing
                and i <= cfg.profile_iter < i + g
            ):
                # capture exactly one dispatch (one scan chunk) as an xprof
                # trace; view with tensorboard or xprof (SURVEY.md §5)
                jax.profiler.start_trace(cfg.profile_dir)
                tracing = True
            n = min(g, cfg.max_iter - i)
            if n == g and multi_fn is not None:
                state, metrics = multi_fn(state, batch, root_key)
            else:
                n = 1
                state, metrics = step_fn(state, batch, root_key)
            i += n
            if tracing:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                tracing = False
                print(f"[INFO] wrote profiler trace to {cfg.profile_dir}")

            # multi_fn returns stacked per-iteration metrics (leaves shaped
            # (n,)); log one record per iteration so an 80k-iter run yields
            # 80k loss points, like the reference's per-iter wandb scalars
            # (train.py:219-337). step_fn returns scalars (n == 1).
            metrics_np = jax.tree.map(np.asarray, metrics)
            for j in range(n):
                logger.write_record(
                    i - n + 1 + j,
                    {"train_" + k: (v[j] if v.ndim else v)
                     for k, v in metrics_np.items()},
                )
            logger.flush()
            last = {k: (v[-1] if v.ndim else v) for k, v in metrics_np.items()}

            # host-side sanity on already-fetched metrics: free, and turns a
            # silent NaN death at iter 50k into an actionable abort.
            if not np.isfinite(float(last["loss"])):
                raise FloatingPointError(
                    f"non-finite loss at iter {i}: {float(last['loss'])}. "
                    "Re-run with debug_nans=True to locate the faulting "
                    "primitive (jax_debug_nans)."
                )
            overflow = int(np.max(metrics_np.get("eta_window_overflow", 0)))
            if overflow > 0:
                print(
                    f"[WARN] iter {i}: event window overflowed its static cap"
                    f" by {overflow} events — the ETA target dropped events;"
                    " raise event_window_cap (or 0 for the exact full-stream"
                    " path)."
                )

            if (cfg.console_log_iter > 0 and i % cfg.console_log_iter == 0) or i == cfg.max_iter:
                dt = time.time() - t_last
                rays_s = rays_per_iter * n / max(dt, 1e-9)
                logger.write("rays_per_sec", rays_s)
                print(
                    f"[TRAIN] iter {i} loss {float(last['loss']):.5f} "
                    f"event {float(last.get('event_loss', 0.0)):.5f} "
                    f"rgb {float(last.get('rgb_loss', 0.0)):.5f} "
                    f"({rays_s:,.0f} rays/s)"
                )
                t_last = time.time()

            if cfg.render_image_iter > 0 and i % cfg.render_image_iter == 0 and i > 0:
                _, results = periodic_eval(
                    state.params, cfg, scene, settings_eval, K_render,
                    H_r, W_r, logdir, i, logger,
                )
                if results:
                    print(f"[EVAL] iter {i}: {results}")

            if cfg.render_video_iter > 0 and i % cfg.render_video_iter == 0 and i > 0:
                poses = rgb_pose_trajectory(state.params, cfg,
                                            scene.rgb_exp_ts, 90)
                frames = [
                    fr["rgb"]
                    for fr in frames_mod.render_trajectory(
                        state.params, poses, K_render, H_r, W_r,
                        settings_eval, chunk=cfg.chunk,
                    )
                ]
                io_mod.save_video(
                    os.path.join(logdir, f"{cfg.index}_spiral_{i:06d}_rgb.mp4"),
                    frames,
                )

            if cfg.save_model_iter > 0 and i % cfg.save_model_iter == 0 and i > 0:
                path = ckpt_mod.save(logdir, state)
                print(f"[INFO] saved checkpoint {path}")

            logger.update_buffer(i)

    logger.close()
    return state


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
