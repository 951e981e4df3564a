"""Benchmark: full BeNeRF train step throughput at the reference workload.

Workload (BASELINE.md): 2 event poses x 1024 rays + 19 rgb poses x 53 rays
= 3,055 rays/iter, each with 64 coarse + 64 fine z-samples through the 8x256
MLP — i.e. 64 + 128 = 192 MLP point evaluations per ray — forward + backward
+ optimizer: the exact shipped-config iteration.

Prints ONE JSON line: rays/s/chip fwd+bwd, plus a roofline account
(model FLOPs/iter, delivered TFLOP/s, MFU vs the chip's bf16 peak).
vs_baseline is relative to the round-1 pure-jnp XLA path measured on one TPU
v5 lite chip (the committed starting point this framework improves on).

Modes:
    python bench.py                 # single-chip TPU throughput + MFU
    python bench.py --dtype bfloat16
    python bench.py --mesh 8 --platform cpu   # sharded-step scaling sweep
                                              # (see also scaling.py)
"""

from __future__ import annotations

import argparse
import json
import time

# Round-1 pure-jnp measurement on TPU v5 lite, recorded 2026-08-17.
BASELINE_RAYS_PER_SEC = 45_540.0

# bf16 MXU peak of one TPU v5 lite (v5e) chip.
PEAK_BF16_FLOPS = 394e12


def mlp_flops_per_point(depth=8, width=256, input_ch=63, views_ch=27,
                        channels=3):
    """Forward multiply-add FLOPs (x2) of one NeRF MLP point evaluation
    (models/nerf.py split-skip layout == reference model/nerf.py:40-116)."""
    f = input_ch * width                      # layer 0
    f += (depth - 2) * width * width          # layers 1..depth-1 (non-skip)
    f += (width + input_ch) * width           # skip layer (concat input)
    f += width * width                        # feature linear
    f += width * 1                            # alpha linear
    f += (width + views_ch) * (width // 2)    # views linear
    f += (width // 2) * channels              # rgb linear
    return 2 * f


def workload_flops_per_iter(cfg):
    """Model FLOPs of one training iteration: MLP fwd + bwd (~2x fwd).

    The MLP dominates (>97%): PE, compositing, sample_pdf, spline and the
    optimizer are O(width) not O(width^2) per point. 192 evals/ray =
    N_samples coarse + (N_samples + N_importance) fine.
    """
    rays = (
        2 * cfg.sampling_event_rays
        + cfg.num_interpolated_pose
        * (cfg.sampling_rgb_rays // cfg.num_interpolated_pose)
    )
    evals = cfg.N_samples + (cfg.N_samples + cfg.N_importance)
    per_point = mlp_flops_per_point(
        depth=cfg.netdepth, width=cfg.netwidth, channels=cfg.channels
    )
    return rays * evals * per_point * 3  # fwd + bwd(2x)


def _setup_jax(platform=None):
    import os

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def run_step_bench(cfg, H, W, mesh=None, inner=25, chunks=4, n_events=1_000_000,
                   profile_dir=None):
    """Compile the (multi-)step and time it; returns (rays/s, dt/iter)."""
    import dataclasses

    import jax
    import numpy as np

    from __graft_entry__ import _random_batch
    from benerf_tpu.data import events as events_mod
    from benerf_tpu.parallel import mesh as mesh_mod
    from benerf_tpu.train import step as step_mod

    batch = _random_batch(cfg, H, W, n_events=n_events)
    cfg = dataclasses.replace(
        cfg,
        event_window_cap=events_mod.window_cap(
            np.asarray(batch.events.ts), cfg.accumulate_time_length
        ),
    )
    state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    if mesh is not None:
        state = mesh_mod.replicate_tree(state, mesh)
    key = jax.random.PRNGKey(1)
    fn = step_mod.make_multi_step(cfg, H, W, inner, mesh=mesh)

    rays_per_iter = (
        2 * cfg.sampling_event_rays
        + cfg.num_interpolated_pose
        * (cfg.sampling_rgb_rays // cfg.num_interpolated_pose)
    )

    import contextlib

    ctx = mesh if mesh is not None else contextlib.nullcontext()
    with ctx:
        state, metrics = fn(state, batch, key)  # warmup/compile
        jax.block_until_ready(metrics["loss"])
        if profile_dir:
            # capture one steady-state dispatch (inner iterations) as an
            # xprof trace; summarize with tools/trace_top_ops.py
            jax.profiler.start_trace(profile_dir)
            state, metrics = fn(state, batch, key)
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
        t0 = time.perf_counter()
        for _ in range(chunks):
            state, metrics = fn(state, batch, key)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0

    iters = inner * chunks
    return rays_per_iter * iters / dt, dt / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--mesh", type=int, default=0,
                   help="run the scaling sweep on an N-device mesh instead of"
                        " the single-chip bench")
    p.add_argument("--platform", default=None,
                   help="force jax platform (the TPU plugin overrides"
                        " JAX_PLATFORMS env)")
    p.add_argument("--inner", type=int, default=25)
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture an xprof trace of one steady-state dispatch"
                        " into DIR (analyze with tools/trace_top_ops.py)")
    args = p.parse_args()

    jax = _setup_jax(args.platform)

    import dataclasses

    from __graft_entry__ import _bench_config

    cfg = _bench_config()
    if args.dtype != "float32":
        cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
    H, W = 400, 600

    if args.mesh:
        from benerf_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh(args.mesh)
        rays_s, dt = run_step_bench(cfg, H, W, mesh=mesh,
                                    inner=args.inner, chunks=args.chunks,
                                    profile_dir=args.profile)
    else:
        rays_s, dt = run_step_bench(cfg, H, W, inner=args.inner,
                                    chunks=args.chunks,
                                    profile_dir=args.profile)

    flops = workload_flops_per_iter(cfg)
    tflops = flops / dt / 1e12
    mfu = flops / dt / PEAK_BF16_FLOPS
    platform = jax.devices()[0].platform
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_s, 1),
                "unit": "rays/s (fwd+bwd+opt, 192 MLP evals/ray)",
                # vs_baseline compares against THIS REPO's round-1 pure-jnp
                # XLA path on one v5e chip (45,540 rays/s) — a self-progress
                # ratio, NOT a reference comparison (the torch reference has
                # no published throughput; its CPU speed here is ~0.03 it/s,
                # see HEADTOHEAD_r05.md). MFU vs bf16 peak is the
                # hardware-meaningful number.
                "vs_baseline": round(rays_s / BASELINE_RAYS_PER_SEC, 3),
                "baseline": "round-1 pure-jnp XLA path, one TPU v5e chip"
                            " (45,540 rays/s; self-progress ratio)",
                "model_flops_per_iter": flops,
                "delivered_tflops": round(tflops, 2),
                "mfu_vs_bf16_peak": round(mfu, 4) if platform == "tpu" else None,
                "compute_dtype": cfg.compute_dtype,
                "platform": platform,
                "mesh_devices": args.mesh or 1,
            }
        )
    )


if __name__ == "__main__":
    main()
