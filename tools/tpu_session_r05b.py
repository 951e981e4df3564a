"""Round-5 TPU session B: perf variants + quality evidence, one chip claim.

Stages (in order; each prints progress and appends to /tmp/r05b_results.json):
  P1  bench: merged 2-call step, NATURAL_WEIGHTS True vs False (the r4
      orientation question re-measured on the shipped 2-call path), plus
      fast_ray_sampling on. Baseline for comparison: session A's 4-call
      127.8k rays/s (/tmp/r05a_results.json).
  P2  tools/perf_breakdown.py -> PERF_r05.json (production-path components
      + in-process measured step).
  H   ours-on-TPU head-to-head runs on the SAME scene directory the torch
      reference is training on (/tmp/h2h/ref/data), at the matched budget
      (256 evt + 247 rgb rays, 24+24 samples, 1500 iters): reference init
      (parity) and motion-scale init (our shipped recipe).
  F   loss-family quality: E2NeRF_Synthetic (lin_log, thr 0.2) and
      E2NeRF_Real (normalized, thr -1) 8k-iter runs ->
      QUALITY_r05_e2syn.json / QUALITY_r05_e2real.json.
  R   robustness sweep: motion-scale across seeds {0,1,2} x blur {3,6,15}px
      + BARF at seeds {0,1} blur 6 (8k iters each) -> ROBUSTNESS_r05.json.

Run: python tools/tpu_session_r05b.py [--stages P1,P2,H,F,R]
"""

import argparse
import json
import os
import shutil
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS_PATH = "/tmp/r05b_results.json"


def _save(results):
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=2, default=str)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="P1,P2,H,F,R")
    ap.add_argument("--sweep_iters", type=int, default=8000)
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # freeze the module set up front (verify-skill lazy-import hazard)
    import __graft_entry__
    import bench as bench_mod
    from benerf_tpu.eval import quality
    from benerf_tpu.ops import pallas_mlp_t

    results = {}

    # ---------------- P1: bench variants ----------------
    if "P1" in stages:
        for natural in (True, False):
            t0 = time.time()
            tag = f"P1_natural={natural}"
            try:
                pallas_mlp_t.NATURAL_WEIGHTS = natural
                cfg = __graft_entry__._bench_config(fast_ray_sampling=True)
                rays_s, dt = bench_mod.run_step_bench(
                    cfg, 400, 600, inner=25, chunks=3)
                results[tag] = {"rays_per_sec": round(rays_s, 1),
                                "ms_per_iter": round(dt * 1e3, 2),
                                "wall_s": round(time.time() - t0, 1)}
            except Exception:
                traceback.print_exc()
                results[tag] = {"ok": False}
            finally:
                pallas_mlp_t.NATURAL_WEIGHTS = True
            print(tag, results[tag], flush=True)
            _save(results)

    # ---------------- P2: perf breakdown ----------------
    if "P2" in stages:
        t0 = time.time()
        try:
            import tools.perf_breakdown as pb

            old_argv = sys.argv
            sys.argv = ["perf_breakdown", "--json_out", "PERF_r05.json"]
            try:
                pb.main()
            finally:
                sys.argv = old_argv
            results["P2_perf_breakdown"] = {
                "ok": True, "wall_s": round(time.time() - t0, 1)}
        except Exception:
            traceback.print_exc()
            results["P2_perf_breakdown"] = {"ok": False}
        print("P2", results["P2_perf_breakdown"], flush=True)
        _save(results)

    # ---------------- H: ours-TPU head-to-head ----------------
    if "H" in stages:
        matched = dict(
            sampling_event_rays=256, sampling_rgb_rays=247,
            N_samples=24, N_importance=24, fast_ray_sampling=True,
        )
        for tag, kw in (
            ("H_ours_tpu_refinit", dict()),
            ("H_ours_tpu_motionscale", dict(pose_init="motion_scale")),
        ):
            t0 = time.time()
            try:
                wd = f"/tmp/h2h/{tag}"
                os.makedirs(wd, exist_ok=True)
                src = "/tmp/h2h/ref/data"
                dst = os.path.join(wd, "data")
                if not os.path.exists(dst):
                    shutil.copytree(src, dst)
                art = quality.run_quality(
                    wd, iters=1500, evals=3, H=80, W=80, seed=0,
                    **matched, **kw)
                out = os.path.join(REPO, f"{tag.upper()}.json")
                results[tag] = {
                    "final": art["checkpoints"][-1],
                    "baseline": art["baseline"],
                    "passed": art["passed"],
                    "wall_s": round(time.time() - t0, 1),
                }
                with open(f"/tmp/h2h/{tag}.json", "w") as f:
                    f.write(json.dumps(art, indent=2) + "\n")
            except Exception:
                traceback.print_exc()
                results[tag] = {"ok": False}
            print(tag, results.get(tag), flush=True)
            _save(results)

    # ---------------- F: loss families ----------------
    if "F" in stages:
        for tag, ds, out_name in (
            ("F_e2syn", "E2NeRF_Synthetic", "QUALITY_r05_e2syn.json"),
            ("F_e2real", "E2NeRF_Real", "QUALITY_r05_e2real.json"),
        ):
            t0 = time.time()
            try:
                art = quality.run_quality(
                    f"/tmp/r05b_{tag}", iters=8000, evals=4, H=80, W=80,
                    seed=0, dataset=ds, target_blur_px=6.0,
                    pose_init="motion_scale", fast_ray_sampling=True,
                )
                with open(os.path.join(REPO, out_name), "w") as f:
                    f.write(json.dumps(art, indent=2) + "\n")
                results[tag] = {"passed": art["passed"],
                                "final": art["checkpoints"][-1],
                                "baseline_flow":
                                    art["baseline"].get("pose_flow_rmse_px"),
                                "wall_s": round(time.time() - t0, 1)}
            except Exception:
                traceback.print_exc()
                results[tag] = {"ok": False}
            print(tag, results.get(tag), flush=True)
            _save(results)

    # ---------------- R: robustness sweep ----------------
    if "R" in stages:
        sweep = []
        runs = [("motion_scale", s, b)
                for s in (0, 1, 2) for b in (3.0, 6.0, 15.0)]
        runs += [("barf", 0, 6.0), ("barf", 1, 6.0)]
        for recipe, seed, blur in runs:
            t0 = time.time()
            tag = f"{recipe}_seed{seed}_blur{int(blur)}"
            kw = (dict(pose_init="motion_scale") if recipe == "motion_scale"
                  else dict(use_barf_c2f=True))
            try:
                art = quality.run_quality(
                    f"/tmp/r05b_sweep/{tag}", iters=args.sweep_iters,
                    evals=2, H=80, W=80, seed=seed, target_blur_px=blur,
                    fast_ray_sampling=True, **kw)
                final = art["checkpoints"][-1]
                gt_flow = art["baseline"]["gt_flow_rms_px"]
                row = {
                    "recipe": recipe, "seed": seed, "blur_px": blur,
                    "final_flow_px": final.get("pose_flow_rmse_px"),
                    "gt_flow_px": gt_flow,
                    "final_psnr": final.get("test_mid_psnr"),
                    "blurry_psnr": art["baseline"]["blurry_input_psnr"],
                    "recovered": bool(
                        final.get("pose_flow_rmse_px", 1e9) < 0.5 * gt_flow),
                    "deblurred": art["passed"][
                        "deblur_psnr_beats_blurry_input"],
                    "wall_s": round(time.time() - t0, 1),
                }
            except Exception:
                traceback.print_exc()
                row = {"recipe": recipe, "seed": seed, "blur_px": blur,
                       "error": True}
            sweep.append(row)
            print("R", row, flush=True)
            results["R_sweep"] = sweep
            _save(results)
        ok_rows = [r for r in sweep if not r.get("error")]
        n_rec = sum(r["recovered"] for r in ok_rows)
        artifact = {
            "protocol": {"iters": args.sweep_iters, "H": 80, "W": 80,
                         "recipes": ["motion_scale", "barf"],
                         "recovered_criterion":
                             "final flow < 0.5 * gt motion"},
            "runs": sweep,
            "pass_rate": round(n_rec / max(len(ok_rows), 1), 3),
            "platform": quality.jax_platform(),
        }
        with open(os.path.join(REPO, "ROBUSTNESS_r05.json"), "w") as f:
            f.write(json.dumps(artifact, indent=2) + "\n")
        print("R pass_rate", artifact["pass_rate"], flush=True)

    _save(results)
    print("SESSION B DONE", flush=True)


if __name__ == "__main__":
    main()
