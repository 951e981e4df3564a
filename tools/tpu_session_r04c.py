"""Third round-4 TPU session (one process, one chip claim):

  1. bench fp32 (+trace) and bf16 with the natural-orientation kernel
     (the per-call weight layout copies are gone — measure the win)
  2. best-recipe quality: pose_init="motion_scale" (GT-free, keeps the
     fused kernel — DIAG variant M: flow 1.82 -> 0.31 at 4k iters), 8k
     iters -> QUALITY_r04_best.json
  3. re-check bench.py end-to-end (the driver's round-end command)

Run: python tools/tpu_session_r04c.py [--skip bench,quality]
"""

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def stage(name, fn):
    print(f"\n######## stage: {name} ########", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"######## {name} done in {time.time()-t0:.0f}s ########",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"######## {name} FAILED after {time.time()-t0:.0f}s ########",
              flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", default="")
    args = p.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if "bench" not in skip:

        def run_bench():
            import dataclasses

            import bench
            from __graft_entry__ import _bench_config

            cfg = _bench_config()
            H, W = 400, 600
            flops = bench.workload_flops_per_iter(cfg)
            out = {}
            for dtype in ("float32", "bfloat16"):
                c = (cfg if dtype == "float32"
                     else dataclasses.replace(cfg, compute_dtype=dtype))
                prof = ("/tmp/benerf_trace_r04c" if dtype == "float32"
                        else None)
                rays_s, dt = bench.run_step_bench(
                    c, H, W, inner=25, chunks=4, profile_dir=prof
                )
                rec = {
                    "rays_per_sec": round(rays_s, 1),
                    "ms_per_iter": round(dt * 1e3, 3),
                    "mfu_vs_bf16_peak": round(
                        flops / dt / bench.PEAK_BF16_FLOPS, 4),
                }
                out[dtype] = rec
                print(f"BENCH_{dtype}:", json.dumps(rec), flush=True)
            with open(os.path.join(REPO, "BENCH_TPU_r04.json"), "w") as f:
                json.dump(out, f, indent=1)
                f.write("\n")

        stage("bench", run_bench)

    if "quality" not in skip:

        def run_quality_best():
            from benerf_tpu.eval import quality

            art = quality.run_quality(
                "/tmp/quality_r04_best",
                iters=8000, evals=4, H=80, W=80, seed=0,
                target_blur_px=6.0,
                pose_init="motion_scale",
            )
            with open(os.path.join(REPO, "QUALITY_r04_best.json"), "w") as f:
                f.write(json.dumps(art, indent=2) + "\n")
            print(f"QUALITY[best]: passed={art['passed']} "
                  f"final={art['checkpoints'][-1] if art['checkpoints'] else {}}",
                  flush=True)

        stage("quality-best", run_quality_best)


if __name__ == "__main__":
    main()
