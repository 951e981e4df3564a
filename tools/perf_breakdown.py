"""Component-level timing of the train step at the bench workload.

The xprof trace (tools/trace_top_ops.py) shows the fused MLP custom calls
are a small fraction of the 30 ms step while input-staging fusions and async
copies dominate — but async attribution is muddy. This tool times each step
component in isolation at the exact production shapes (fwd+bwd where the
step differentiates through it), giving a table whose sum can be checked
against the measured step time.

Components (bench workload: 2048 evt rays x 2 poses, 1007 rgb rays,
64 coarse + 128 fine samples, H,W = 400x600, 1M events):

  ray_perm      2x jax.random.permutation over H*W (240k) per step
  pe_stage      positional_encoding + pad + vb broadcast for all 4 MLP
                calls, fwd + bwd (the kernel's HBM staging)
  mlp_kernel    fused Pallas MLP fwd+bwd on the same point counts
  composite     volume.composite fwd+bwd (both levels)
  z_sort        sort(concat(z, z_samples)) fwd+bwd
  sample_pdf    inverse-CDF fine sampling (no grad: stop_gradient'ed)
  eta           capped-slice segment-sum ETA + gather at ray indices
  spline        4-knot cubic spline interpolation at 21 times, fwd+bwd
  rng_noise     sigma-noise normal draws at both levels

Run (TPU): python tools/perf_breakdown.py [--json_out PERF_r04.json]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVT, N_RGB, N_POSES = 2048, 53 * 19, 19
S_C, S_F = 64, 128
H, W = 400, 600
RAYS = 2 * N_EVT + N_RGB  # render rows (event x2 poses, rgb x19 merged rows)
N_RAYS_TOTAL = 2 * N_EVT + N_RGB * N_POSES  # hmm: rgb rows = rays per pose*19


def timeit(fn, *args, reps=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json_out", default=None)
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benerf_tpu.data import events as events_mod
    from benerf_tpu.models import embedder, nerf as nerf_mod
    from benerf_tpu.ops import pallas_mlp
    from benerf_tpu.render import pdf as pdf_mod
    from benerf_tpu.render import volume

    key = jax.random.PRNGKey(0)
    results = {}

    # rows rendered per level: event rays appear twice (2 poses), rgb rays
    # once per each of 19 poses
    rows = 2 * N_EVT + N_RGB  # = 5103? no: rgb render tiles 53 rays x 19
    rows = 2 * N_EVT + 53 * 19
    n_coarse = rows * S_C
    n_fine = rows * S_F

    # --- ray_perm
    def perm2(k):
        k1, k2 = jax.random.split(k)
        a = jax.random.permutation(k1, H * W)[:N_EVT]
        b = jax.random.permutation(k2, H * W)[:N_RGB // N_POSES]
        return a, b

    results["ray_perm"] = timeit(jax.jit(perm2), key, reps=args.reps)

    # --- pe staging (fwd+bwd) at total point count
    pts = jax.random.normal(key, (rows, S_F, 3))
    vd = jax.random.normal(key, (rows, 3))
    params = nerf_mod.init_params(jax.random.PRNGKey(1), channels=3,
                                  use_viewdirs=True)

    def pe_stage(pts_, vd_, w_pe, b_):
        n = pts_.shape[0] * pts_.shape[1]
        vpe = embedder.positional_encoding(vd_, 4)
        vb = vpe @ w_pe + b_
        vb = jnp.broadcast_to(
            vb[:, None, :], (pts_.shape[0], pts_.shape[1], 128)
        ).reshape(n, 128)
        pe = embedder.positional_encoding(pts_.reshape(n, 3), 10)
        pe = jnp.pad(pe, ((0, 0), (0, 1)))
        return jnp.sum(pe * 1e-6) + jnp.sum(vb * 1e-6)

    g_pe = jax.jit(jax.grad(pe_stage, argnums=(0, 1, 2)))
    results["pe_stage_fine"] = timeit(
        g_pe, pts, vd, params["views"]["w_pe"], params["views"]["b"],
        reps=args.reps,
    )
    pts_c = pts[:, :S_C]
    results["pe_stage_coarse"] = timeit(
        g_pe, pts_c, vd, params["views"]["w_pe"], params["views"]["b"],
        reps=args.reps,
    )

    # --- fused kernel fwd+bwd (isolated: pre-staged pe/vb)
    def kern(p_, pts_, vd_):
        return jnp.sum(pallas_mlp.fused_nerf_mlp(p_, pts_, vd_) ** 2)

    g_kern = jax.jit(jax.grad(kern, argnums=(0,)))
    results["mlp_fine_full"] = timeit(g_kern, params, pts, vd, reps=args.reps)
    results["mlp_coarse_full"] = timeit(g_kern, params, pts_c, vd,
                                        reps=args.reps)

    # --- composite fwd+bwd both levels
    raw_c = jax.random.normal(key, (rows, S_C, 4))
    raw_f = jax.random.normal(key, (rows, S_F, 4))
    z_c = jnp.sort(jax.random.uniform(key, (rows, S_C)), axis=-1)
    z_f = jnp.sort(jax.random.uniform(key, (rows, S_F)), axis=-1)
    rd = jax.random.normal(key, (rows, 3))

    def comp(raw1, raw2):
        a = volume.composite(raw1, z_c, rd, 3, noise_std=0.0)
        b = volume.composite(raw2, z_f, rd, 3, noise_std=0.0)
        return jnp.sum(a["rgb_map"]) + jnp.sum(b["rgb_map"])

    results["composite"] = timeit(
        jax.jit(jax.grad(comp, argnums=(0, 1))), raw_c, raw_f, reps=args.reps
    )

    # --- z sort fwd+bwd
    zs = jax.random.uniform(key, (rows, S_C))

    def zsort(z1, z2):
        return jnp.sum(jnp.sort(jnp.concatenate([z1, z2], -1), -1) ** 2)

    results["z_sort"] = timeit(jax.jit(jax.grad(zsort)), z_c, zs,
                               reps=args.reps)

    # --- sample_pdf (no grad path)
    wts = jax.random.uniform(key, (rows, S_C - 2))
    zm = z_c[:, :-1]

    def spdf(w_):
        return pdf_mod.sample_pdf(zm, w_, 64, key=key)

    results["sample_pdf"] = timeit(jax.jit(spdf), wts, reps=args.reps)

    # --- eta scatter + gather
    n_ev = 1_000_000
    ts = jnp.sort(jax.random.uniform(key, (n_ev,)))
    pix = jax.random.randint(key, (n_ev,), 0, H * W, dtype=jnp.int32)
    pol = jnp.sign(jax.random.normal(key, (n_ev,)))
    ev = events_mod.EventArrays(pix, ts, pol)
    import numpy as np

    cap = events_mod.window_cap(np.asarray(ts), 0.1)
    ridx = jax.random.permutation(key, H * W)[:N_EVT]

    def eta_fn(lo):
        eta, _ = events_mod.eta_time_window(ev, H * W, lo, lo + 0.1, cap=cap)
        return eta[ridx]

    results["eta"] = timeit(jax.jit(eta_fn), jnp.float32(0.37),
                            reps=args.reps)

    # --- spline interpolation fwd+bwd
    from benerf_tpu.geometry import spline as spline_mod

    knots = jax.random.normal(key, (4, 6)) * 0.05

    def spl(k_):
        a = spline_mod.interpolate_poses(k_, 0.3, 0.4, 2, "spline")
        b = spline_mod.interpolate_poses(k_, 0.0, 1.0, N_POSES, "spline")
        return jnp.sum(a) + jnp.sum(b)

    results["spline"] = timeit(jax.jit(jax.grad(spl)), knots, reps=args.reps)

    # --- rng noise draws
    def noise(k):
        k1, k2 = jax.random.split(k)
        return (jax.random.normal(k1, (rows, S_C)),
                jax.random.normal(k2, (rows, S_F)))

    results["rng_noise"] = timeit(jax.jit(noise), key, reps=args.reps)

    total = sum(results.values())
    print("\ncomponent timings (ms, fwd+bwd where differentiated):")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k:18s} {v:8.3f}")
    print(f"  {'SUM':18s} {total:8.3f}   (measured full step ~30.5 ms)")
    if args.json_out:
        out = args.json_out if os.path.isabs(args.json_out) else os.path.join(
            REPO, args.json_out)
        with open(out, "w") as f:
            json.dump({"components_ms": results, "sum_ms": round(total, 3),
                       "platform": jax.devices()[0].platform}, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
