"""Reference-protocol-scale run (VERDICT r3 task 5): the shipped-config
80,000-iteration protocol (configs/benerf_blender/tanabata.txt max_iter,
/root/reference/train.py:153) on the synthetic scene, on the TPU, with:

  - periodic eval every 5k iters (pose flow + PSNR curves),
  - checkpoint saves every 5k,
  - a REAL mid-run resume: training stops at --split iters, a second
    train() call restores the latest checkpoint and continues to the end
    (exercising train/checkpoint.py restore + identical-continuation on the
    production path, not just the unit test),
  - the LR-decay tail reached (lrate_decay=200 -> lr x0.63 by 80k).

Writes one JSON artifact (default PROTOCOL_r04.json).

Run: python tools/protocol_run.py --workdir /tmp/protocol --iters 80000
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--iters", type=int, default=80000)
    p.add_argument("--split", type=int, default=40000,
                   help="stop/resume boundary (0 = single phase)")
    p.add_argument("--eval_iter", type=int, default=5000)
    p.add_argument("--size", type=int, default=80,
                   help="square scene size (overridden by --height/--width)")
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--focal", type=float, default=0.0,
                   help="0 = 1.125*size (the 80x80 demo ratio); at the "
                        "reference operating point use ~541.85 "
                        "(configs/benerf_blender/tanabata.txt intrinsics)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--target_blur_px", type=float, default=6.0)
    p.add_argument("--event_threshold", type=float, default=0.1,
                   help="contrast threshold for BOTH the scene generator "
                        "and the training loss (lower -> denser events)")
    p.add_argument("--use_barf_c2f", action="store_true")
    p.add_argument("--pose_init", default="reference",
                   choices=["reference", "motion_scale"])
    p.add_argument("--fast_ray_sampling", action="store_true")
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--out", default="PROTOCOL_r05.json")
    args = p.parse_args()

    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benerf_tpu.data import datasets, synthetic
    from benerf_tpu.eval import metrics as metrics_mod
    from benerf_tpu.eval import quality
    from benerf_tpu.train.loop import train

    t0 = time.time()
    H = args.height or args.size
    W = args.width or args.size
    focal = args.focal or 1.125 * args.size
    datadir = os.path.join(args.workdir, "data")
    logdir = quality._fresh_run_dir(os.path.join(args.workdir, "logs"))
    if not os.path.exists(os.path.join(datadir, "poses_ts.txt")):
        synthetic.write_benerf_blender_scene(
            datadir, H=H, W=W, focal=focal, seed=args.seed, n_images=1,
            target_blur_px=args.target_blur_px,
            threshold=args.event_threshold,
        )

    base = quality.demo_config(
        datadir, logdir, args.iters, evals=args.iters // args.eval_iter,
        H=H, W=W, focal=focal, seed=args.seed,
        render_image_iter=args.eval_iter,
        save_model_iter=args.eval_iter,
        console_log_iter=1000,
        use_barf_c2f=args.use_barf_c2f,
        event_threshold=args.event_threshold,
        pose_init=args.pose_init,
        fast_ray_sampling=args.fast_ray_sampling,
        compute_dtype=args.compute_dtype,
    )
    scene = datasets.load_scene(datadir, base)
    K = np.array(
        [[base.rgb_fx, 0, base.rgb_cx], [0, base.rgb_fy, base.rgb_cy],
         [0, 0, 1]]
    )
    baseline = {
        "blurry_input_psnr": metrics_mod.psnr(scene.image[0], scene.imgtest[0]),
        **quality.initial_pose_error(scene, base, K, H, W),
    }

    resume_info = {"split": args.split, "resumed": False}
    if args.split and 0 < args.split < args.iters:
        cfg1 = dataclasses.replace(base, max_iter=args.split)
        train(cfg1, scene)
        t_split = time.time()
        cfg2 = dataclasses.replace(base, load_checkpoint=True)
        state = train(cfg2, scene)
        resume_info.update(
            resumed=True,
            phase1_wall_s=round(t_split - t0, 1),
            phase2_wall_s=round(time.time() - t_split, 1),
            final_step=int(np.asarray(state.step)),
        )
    else:
        state = train(base, scene)
        resume_info["final_step"] = int(np.asarray(state.step))

    # harvest eval records
    checkpoints = []
    with open(os.path.join(logdir, "0", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "test_mid_psnr" in rec:
                checkpoints.append({k: rec[k] for k in (
                    "step", "test_mid_psnr", "test_mid_ssim",
                    "pose_ate_rmse", "pose_flow_rmse_px", "gt_flow_rms_px")
                    if k in rec})
    # steady-state throughput from logged rays_per_sec records
    rays = []
    with open(os.path.join(logdir, "0", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "rays_per_sec" in rec:
                rays.append(rec["rays_per_sec"])

    final = checkpoints[-1] if checkpoints else {}
    artifact = {
        "protocol": {"iters": args.iters, "eval_iter": args.eval_iter,
                     "use_barf_c2f": args.use_barf_c2f,
                     "pose_init": args.pose_init,
                     "fast_ray_sampling": args.fast_ray_sampling,
                     "compute_dtype": args.compute_dtype},
        "scene": {"H": H, "W": W, "focal": focal, "seed": args.seed,
                  "event_threshold": args.event_threshold,
                  "target_blur_px": args.target_blur_px,
                  "n_events": int(scene.events.num)},
        "baseline": baseline,
        "resume": resume_info,
        "checkpoints": checkpoints,
        "median_rays_per_sec": (float(np.median(rays[2:])) if len(rays) > 4
                                else None),
        "passed": {
            "completed_all_iters": resume_info.get("final_step") == args.iters,
            "no_nan": True,  # train() aborts on non-finite loss
            "deblur_psnr_beats_blurry_input": bool(
                final.get("test_mid_psnr", -np.inf)
                > baseline["blurry_input_psnr"]
            ),
            "pose_flow_improves": bool(
                final.get("pose_flow_rmse_px", np.inf)
                < baseline.get("pose_flow_rmse_px", np.inf) * 0.75
            ),
        },
        "run_dir": logdir,
        "wall_s": round(time.time() - t0, 1),
        "platform": quality.jax_platform(),
    }
    text = json.dumps(artifact, indent=2)
    print(text)
    out = (args.out if os.path.isabs(args.out)
           else os.path.join(REPO, args.out))
    with open(out, "w") as f:
        f.write(text + "\n")


if __name__ == "__main__":
    main()
