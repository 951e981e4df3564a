"""Round-5 TPU session B2: kernel tile-size sweep on the merged 2-call step.

TILE (fwd points/grid-step) and BWD_TILE (backward rematerialization tile)
are VMEM-bounded choices made in round 4 without an on-chip sweep. Measure
the bench workload at the candidate sizes; the winner ships as the module
default. VMEM bound: bwd keeps 8 (256, BWD_TILE) activations + packed
weights (~2.3 MB) + weight grads (~2.3 MB) in ~16 MB.

Run: python tools/tpu_session_r05c.py
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

    import __graft_entry__
    import bench as bench_mod
    from benerf_tpu.ops import pallas_mlp_t

    results = {}
    variants = [
        (1024, 512, True),    # shipped default + fwd parallel grid
        (1024, 512, False),   # r4 semantics (arbitrary fwd grid)
        (1024, 768, True),
        (1024, 1024, True),
        (2048, 512, True),
        (2048, 1024, True),
        (512, 512, True),
    ]
    for tile, bwd, fpar in variants:
        tag = f"tile={tile},bwd={bwd},fwd_par={fpar}"
        t0 = time.time()
        try:
            pallas_mlp_t.TILE = tile
            pallas_mlp_t.BWD_TILE = bwd
            pallas_mlp_t.FWD_PARALLEL = fpar
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
            pallas_mlp_t.TILE = 1024
            pallas_mlp_t.BWD_TILE = 512
            pallas_mlp_t.FWD_PARALLEL = True
        print(tag, results[tag], flush=True)
        with open("/tmp/r05c_results.json", "w") as f:
            json.dump(results, f, indent=2)
    print("SESSION B2 DONE", flush=True)


if __name__ == "__main__":
    main()
