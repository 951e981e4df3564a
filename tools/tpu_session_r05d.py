"""Round-5 TPU session D: production-scale 80k-iteration protocol runs.

The reference's operating point (VERDICT r4 missing #1): reference-class
resolution (400x600, tanabata-class focal 541.85), 10^5+ events, the full
80k-iteration protocol (configs/benerf_blender/tanabata.txt max_iter) with
mid-run resume — run with BOTH recovery recipes:

  1. motion-scale init (the shipped demo.txt recipe) -> PROTOCOL_r05.json
  2. BARF c2f from the reference random init     -> PROTOCOL_r05_barf.json

One process, one chip claim. The scene is pre-generated on the host
(/tmp/protocol_r05/data, tools-independent) so the claim starts computing
immediately.

Run: python tools/tpu_session_r05d.py [--iters 80000]
"""

import argparse
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=80000)
    ap.add_argument("--eval_iter", type=int, default=5000)
    args = ap.parse_args()

    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import tools.protocol_run as protocol_run

    # preamble: re-verify the BWD_TILE sweep winner now that fused_nerf_mlp
    # pads to lcm(TILE, BWD_TILE) (the r05c sweep's 768 row predated the
    # divisibility fix). Prints only; module defaults ship the winner.
    try:
        import json as _json

        import __graft_entry__
        import bench as bench_mod
        from benerf_tpu.ops import pallas_mlp_t

        pre = {}
        for bwd in (512, 768, 1024):
            pallas_mlp_t.BWD_TILE = bwd
            cfg = __graft_entry__._bench_config(fast_ray_sampling=True)
            rays_s, dt = bench_mod.run_step_bench(
                cfg, 400, 600, inner=25, chunks=2)
            pre[bwd] = {"rays_per_sec": round(rays_s, 1),
                        "ms_per_iter": round(dt * 1e3, 2)}
            print(f"preamble bwd={bwd}:", pre[bwd], flush=True)
        pallas_mlp_t.BWD_TILE = 768
        with open("/tmp/r05d_preamble.json", "w") as f:
            _json.dump(pre, f, indent=1)
    except Exception:
        traceback.print_exc()

    runs = [
        ("PROTOCOL_r05.json", "/tmp/protocol_r05",
         ["--pose_init", "motion_scale", "--fast_ray_sampling"]),
        ("PROTOCOL_r05_barf.json", "/tmp/protocol_r05_barf",
         ["--use_barf_c2f", "--fast_ray_sampling"]),
    ]
    for out, wd, extra in runs:
        t0 = time.time()
        argv = [
            "protocol_run", "--workdir", wd,
            "--iters", str(args.iters), "--eval_iter", str(args.eval_iter),
            "--split", str(args.iters // 2),
            "--height", "400", "--width", "600", "--focal", "541.85",
            "--target_blur_px", "15.0", "--event_threshold", "0.05",
            "--out", out,
        ] + extra
        # both runs share the same pre-generated scene: the barf workdir
        # symlinks the motion-scale data dir if absent
        os.makedirs(wd, exist_ok=True)
        data = os.path.join(wd, "data")
        if not os.path.exists(data) and wd != "/tmp/protocol_r05":
            os.symlink("/tmp/protocol_r05/data", data)
        old = sys.argv
        sys.argv = argv
        try:
            protocol_run.main()
            print(f"{out} done in {time.time() - t0:.0f}s", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"{out} FAILED", flush=True)
        finally:
            sys.argv = old

    # final perf record at the shipped kernel defaults: official bench
    # numbers + an xprof trace summarized into PROFILE_r05.json
    try:
        import json

        import __graft_entry__
        import bench as bench_mod

        cfg = __graft_entry__._bench_config(fast_ray_sampling=True)
        rays_s, dt = bench_mod.run_step_bench(
            cfg, 400, 600, inner=25, chunks=4,
            profile_dir="/tmp/benerf_trace_r05")
        flops = bench_mod.workload_flops_per_iter(cfg)
        rec = {
            "rays_per_sec": round(rays_s, 1),
            "ms_per_iter": round(dt * 1e3, 3),
            "mfu_vs_bf16_peak": round(flops / dt / bench_mod.PEAK_BF16_FLOPS,
                                      4),
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
    print("SESSION D DONE", flush=True)


if __name__ == "__main__":
    main()
