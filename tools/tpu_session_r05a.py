"""Round-5 TPU session A: end-to-end verify of the Phase-A changes + bench
baseline under both ray-sampling modes.

One process, one chip claim (see .claude/skills/verify — batched stages).

Stages:
  V1  quality harness, 400 iters on the 80x80 demo scene (motion-scale init,
      fast_ray_sampling on — the demo.txt path): loss falls, deblur gate.
  V2  checkpoint restore from V1's logdir + one full-frame render (resume path).
  B   bench.run_step_bench at the reference workload, fast_ray_sampling
      True/False (the config default flipped to False this round — measure
      what the flip costs/buys on-chip).

Run: python tools/tpu_session_r05a.py
"""

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # import the tree up front: later file edits in the repo cannot change
    # what this session tests (lazy-import hazard, skills/verify)
    import __graft_entry__
    import bench
    from benerf_tpu.eval import frames as _  # noqa
    from benerf_tpu.eval import quality
    from benerf_tpu.train import checkpoint as ckpt_mod

    results = {}

    # ---- V1: e2e quality run (the verify recipe, one process) ----
    t0 = time.time()
    try:
        art = quality.run_quality(
            "/tmp/r05a_q", iters=400, evals=2, H=80, W=80, seed=0,
            target_blur_px=6.0, pose_init="motion_scale",
            fast_ray_sampling=True,
        )
        final = art["checkpoints"][-1]
        ok = (art["passed"]["deblur_psnr_beats_blurry_input"]
              and final["test_mid_psnr"] > 25.0)
        results["V1_quality_400"] = {
            "ok": bool(ok), "final": final, "passed": art["passed"],
            "run_dir": art["run_dir"], "wall_s": round(time.time() - t0, 1)}
        print("V1:", results["V1_quality_400"], flush=True)
    except Exception:
        traceback.print_exc()
        results["V1_quality_400"] = {"ok": False}

    # ---- V2: checkpoint restore + full-frame render ----
    try:
        import numpy as np

        from benerf_tpu.eval import frames as frames_mod
        from benerf_tpu.render import renderer as renderer_mod
        from benerf_tpu.train import step as step_mod
        from benerf_tpu.train.loop import rgb_pose_trajectory

        logdir = os.path.join(results["V1_quality_400"]["run_dir"], "0")
        cfg = quality.demo_config(
            "/tmp/r05a_q/data", results["V1_quality_400"]["run_dir"],
            400, 2, H=80, W=80, pose_init="motion_scale",
            fast_ray_sampling=True,
        )
        state = step_mod.init_state(cfg, jax.random.PRNGKey(cfg.seed))
        state = ckpt_mod.restore(logdir, state)
        assert int(state.step) == 400, int(state.step)
        poses = rgb_pose_trajectory(state.params, cfg, [0.0, 1.0], 3)
        settings = renderer_mod.RenderSettings.from_config(cfg)
        import numpy as _np

        K = _np.array([[90.0, 0, 40.0], [0, 90.0, 40.0], [0, 0, 1]],
                      _np.float32)
        fr = list(frames_mod.render_trajectory(
            state.params, poses, K, 80, 80, settings, chunk=cfg.chunk,
            deterministic=True,
        ))
        assert len(fr) == 3 and np.isfinite(fr[1]["rgb"]).all()
        results["V2_ckpt_render"] = {"ok": True,
                                     "restored_step": int(state.step)}
        print("V2:", results["V2_ckpt_render"], flush=True)
    except Exception:
        traceback.print_exc()
        results["V2_ckpt_render"] = {"ok": False}

    # ---- B: bench at reference workload, both sampling modes ----
    import dataclasses

    for fast in (True, False):
        t0 = time.time()
        try:
            cfg = __graft_entry__._bench_config(fast_ray_sampling=fast)
            rays_s, dt = bench.run_step_bench(cfg, 400, 600, inner=25,
                                              chunks=2)
            results[f"B_fast={fast}"] = {
                "rays_per_sec": round(rays_s, 1),
                "ms_per_iter": round(dt * 1e3, 2),
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"B fast={fast}:", results[f"B_fast={fast}"], flush=True)
        except Exception:
            traceback.print_exc()
            results[f"B_fast={fast}"] = {"ok": False}

    with open("/tmp/r05a_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print("SESSION DONE", flush=True)


if __name__ == "__main__":
    main()
