"""One TPU process, all round-4 measurement stages in sequence.

The chip grant goes through a relay and a process that starts while another
is claiming wedges forever (see .claude/skills/verify); batching every TPU
stage into one process pays the ~8-min session init once and avoids the
claim race entirely.

Stages (each guarded — a failure skips to the next):
  1. bench fp32 + xprof trace        -> BENCH check + /tmp/benerf_trace_r04
  2. bench bf16                      -> dtype comparison
  3. protocol run (80k iters, resume)-> PROTOCOL_r04.json
  4. pose_diag variants I,J,H,K      -> DIAG_r04.json (merged)

Run: python tools/tpu_session_r04.py [--skip bench,protocol,diag]
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
    p.add_argument("--protocol_iters", type=int, default=80000)
    p.add_argument("--diag_only", default="I,J,H,K")
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
            rays_s, dt = bench.run_step_bench(
                cfg, H, W, inner=25, chunks=4,
                profile_dir="/tmp/benerf_trace_r04",
            )
            flops = bench.workload_flops_per_iter(cfg)
            rec = {
                "dtype": "float32", "rays_per_sec": round(rays_s, 1),
                "ms_per_iter": round(dt * 1e3, 3),
                "mfu_vs_bf16_peak": round(flops / dt / bench.PEAK_BF16_FLOPS, 4),
            }
            print("BENCH_F32:", json.dumps(rec), flush=True)

            cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
            rays_s16, dt16 = bench.run_step_bench(cfg16, H, W, inner=25,
                                                  chunks=4)
            rec16 = {
                "dtype": "bfloat16", "rays_per_sec": round(rays_s16, 1),
                "ms_per_iter": round(dt16 * 1e3, 3),
                "mfu_vs_bf16_peak": round(
                    flops / dt16 / bench.PEAK_BF16_FLOPS, 4),
            }
            print("BENCH_BF16:", json.dumps(rec16), flush=True)
            with open(os.path.join(REPO, "BENCH_TPU_r04_interim.json"),
                      "w") as f:
                json.dump({"f32": rec, "bf16": rec16}, f, indent=1)

        stage("bench+trace", run_bench)

    if "protocol" not in skip:

        def run_protocol():
            import protocol_run

            sys.argv = [
                "protocol_run", "--workdir", "/tmp/protocol_r04",
                "--iters", str(args.protocol_iters),
                "--split", str(args.protocol_iters // 2),
                "--out", "PROTOCOL_r04.json",
            ]
            protocol_run.main()

        stage("protocol-80k", run_protocol)

    if "diag" not in skip:

        def run_diag():
            import pose_diag

            sys.argv = [
                "pose_diag", "--iters", "4000", "--evals", "4",
                "--size", "80", "--workdir", "/tmp/pose_diag",
                "--out", "DIAG_r04.json", "--only", args.diag_only,
            ]
            pose_diag.main()

        stage("pose-diag", run_diag)


if __name__ == "__main__":
    main()
