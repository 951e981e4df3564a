"""Scaling harness: sharded-train-step efficiency vs mesh size.

BASELINE.json's north star asks >=80% scaling efficiency at 1 chip / 1 host /
N hosts. Real multi-chip hardware is not attached in this container, so this
harness measures what it can and labels it honestly:

  - WEAK scaling on the virtual 8-device CPU mesh (xla_force_host_platform_
    device_count): per-device ray batch held constant, so ideal time is flat
    vs N. This exercises the real production sharded step (shard_map'd MLP,
    with_sharding_constraint'd ray tensors, XLA-inserted gradient psum) and
    prices the collective/SPMD overhead — but CPU devices share cores, so
    compute time is NOT expected to stay flat; the honest overhead proxy is
    reported as work-normalized throughput (rays/s summed over devices).
  - The single real TPU chip number (bench.py) anchors per-chip absolute
    throughput.

Usage:
    python scaling.py --out SCALING_r03.json          # CPU-mesh sweep
    python scaling.py --mesh-sizes 1,2,4,8 --rays-per-dev 256
"""

from __future__ import annotations

import argparse
import json
import os

# must precede any jax import
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def sweep(mesh_sizes, rays_per_dev, n_samples=32, inner=10, chunks=3):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from __graft_entry__ import _bench_config
    from bench import run_step_bench
    from benerf_tpu.parallel import mesh as mesh_mod

    results = []
    for n in mesh_sizes:
        cfg = _bench_config(
            N_samples=n_samples,
            N_importance=n_samples,
            sampling_event_rays=rays_per_dev * n,
            sampling_rgb_rays=rays_per_dev * n,
            num_interpolated_pose=19,
            use_pallas=False,  # jnp path: CPU has no Mosaic; the sharding
            # structure (shard_map/psum) is identical either way
        )
        mesh = mesh_mod.make_mesh(n) if n > 1 else None
        rays_s, dt = run_step_bench(
            cfg, 400, 600, mesh=mesh, inner=inner, chunks=chunks,
            n_events=100_000,
        )
        results.append(
            {
                "mesh_devices": n,
                "rays_per_iter": int(
                    2 * cfg.sampling_event_rays
                    + 19 * (cfg.sampling_rgb_rays // 19)
                ),
                "sec_per_iter": dt,
                "rays_per_sec": rays_s,
            }
        )
        print(f"[SCALING] mesh={n}: {dt*1e3:.1f} ms/iter, "
              f"{rays_s:,.0f} rays/s", flush=True)

    base = results[0]
    for r in results:
        # weak-scaling efficiency: ideal keeps sec_per_iter flat as work and
        # devices grow together -> eff = T1 / TN
        r["weak_scaling_efficiency"] = base["sec_per_iter"] / r["sec_per_iter"]
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh-sizes", default="1,2,4,8")
    p.add_argument("--rays-per-dev", type=int, default=256)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--chunks", type=int, default=3)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    sizes = [int(s) for s in args.mesh_sizes.split(",")]
    results = sweep(sizes, args.rays_per_dev, inner=args.inner,
                    chunks=args.chunks)
    doc = {
        "mode": "weak_scaling_cpu_virtual_mesh",
        "note": "virtual CPU devices share host cores: efficiency below 1.0 "
                "includes real core contention, not just collective overhead; "
                "the sharded step graph (shard_map MLP + psum grads) is the "
                "production TPU one.",
        "rays_per_device": args.rays_per_dev,
        "results": results,
    }
    text = json.dumps(doc, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
