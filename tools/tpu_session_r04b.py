"""Second round-4 TPU session (one process, one chip claim):

  1. bench fp32 + xprof trace — first measurement of the transposed
     fully-fused kernel — then bench bf16 (cmpf fix landed)
  2. tools/perf_breakdown component table -> PERF_r04.json
  3. pose_diag variants L (250% perturbed GT) and M (motion-scale init)
  4. QUALITY_r04.json: 8k iters, BARF coarse-to-fine, reference random
     init (the headline artifact: pose_flow_improves from honest init)
  5. QUALITY_r04_bf16.json: same in bf16

Run: python tools/tpu_session_r04b.py [--skip bench,perf,diag,quality]
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
    p.add_argument("--quality_iters", type=int, default=8000)
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
                prof = ("/tmp/benerf_trace_r04b" if dtype == "float32"
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

    if "perf" not in skip:

        def run_perf():
            import perf_breakdown

            sys.argv = ["perf_breakdown", "--json_out", "PERF_r04.json"]
            perf_breakdown.main()

        stage("perf-breakdown", run_perf)

    if "diag" not in skip:

        def run_diag():
            import pose_diag

            sys.argv = [
                "pose_diag", "--iters", "4000", "--evals", "4",
                "--size", "80", "--workdir", "/tmp/pose_diag",
                "--out", "DIAG_r04.json", "--only", "L,M",
            ]
            pose_diag.main()

        stage("pose-diag-LM", run_diag)

    if "quality" not in skip:

        def run_quality_pair():
            from benerf_tpu.eval import quality

            for dtype, out_name in (
                ("float32", "QUALITY_r04.json"),
                ("bfloat16", "QUALITY_r04_bf16.json"),
            ):
                art = quality.run_quality(
                    f"/tmp/quality_r04_{dtype}",
                    iters=args.quality_iters, evals=4, H=80, W=80, seed=0,
                    target_blur_px=6.0,
                    use_barf_c2f=True,
                    compute_dtype=dtype,
                )
                text = json.dumps(art, indent=2)
                with open(os.path.join(REPO, out_name), "w") as f:
                    f.write(text + "\n")
                print(f"QUALITY[{dtype}]: passed={art['passed']} "
                      f"final={art['checkpoints'][-1] if art['checkpoints'] else {}}",
                      flush=True)

        stage("quality-pair", run_quality_pair)


if __name__ == "__main__":
    main()
