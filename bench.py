"""Benchmark: full BeNeRF train step throughput at the reference workload.

Workload (BASELINE.md): 2 event poses x 1024 rays + 19 rgb poses x 53 rays
= 3,055 rays/iter, each with 64 coarse + 64 fine samples through the 8x256
MLP, forward+backward+optimizer — the exact shipped-config iteration.

Prints ONE JSON line: rays/s/chip fwd+bwd. vs_baseline is relative to the
round-1 pure-jnp XLA path measured on one TPU v5 lite chip (the committed
starting point this framework improves on).
"""

from __future__ import annotations

import json
import time

# Round-1 pure-jnp measurement on TPU v5 lite, recorded 2026-08-17.
BASELINE_RAYS_PER_SEC = 45_540.0


def main():
    import os

    import jax

    # first compile through the remote-compile tunnel is minutes; persist it
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _bench_config, _random_batch
    from benerf_tpu.train import step as step_mod

    import dataclasses

    import numpy as np

    from benerf_tpu.data import events as events_mod

    cfg = _bench_config()
    H, W = 400, 600
    batch = _random_batch(cfg, H, W, n_events=1_000_000)
    cfg = dataclasses.replace(
        cfg,
        event_window_cap=events_mod.window_cap(
            np.asarray(batch.events.ts), cfg.accumulate_time_length
        ),
    )
    state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    inner = 25
    fn = step_mod.make_multi_step(cfg, H, W, inner)

    rays_per_iter = (
        2 * cfg.sampling_event_rays
        + cfg.num_interpolated_pose
        * (cfg.sampling_rgb_rays // cfg.num_interpolated_pose)
    )

    # warmup / compile
    state, metrics = fn(state, batch, key)
    jax.block_until_ready(metrics["loss"])

    chunks = 4
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, metrics = fn(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = rays_per_iter * inner * chunks / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s (fwd+bwd+opt, 128 samples/ray)",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
