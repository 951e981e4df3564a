"""Component-level timing of the train step at the bench workload.

Times each step component in isolation at the exact production shapes
(fwd+bwd where the step differentiates through it) and cross-checks the sum
against the measured full step (also timed here, same process) — a truthful
ranking for the next perf round (VERDICT r4 weak #4: the r4 table timed the
replaced jnp.sort fine-merge and the 2048-ray workload).

Production path components (bench workload: 1024 evt rays x 2 poses,
53x19 rgb rows, 64 coarse + 128 fine samples, H,W = 400x600, 1M events;
see __graft_entry__._bench_config):

  ray_subset_fast  approx_max_k stratified subsets (fast_ray_sampling=True,
                   the perf-config path) — both sensors
  ray_subset_perm  full randperm slice (reference semantics, config default)
  pv_pack          the transposed kernel's ONLY staging: (8, n) input build
                   (transpose + concat) fwd+bwd, both levels, merged 2-call
                   shapes
  mlp_coarse/fine  fused transposed Pallas kernel fwd+bwd at the MERGED
                   per-level point counts (both ray families in one call —
                   the shipped 2-call step)
  composite        volume.composite fwd+bwd (both levels)
  z_merge          merge_sorted(z_vals, z_samples) fwd+bwd (production;
                   z_sort_jnp = the replaced full sort, for comparison)
  sample_pdf       inverse-CDF fine sampling, sorted order-statistic draws
                   (production; no grad: stop_gradient'ed)
  eta              capped-slice segment-sum ETA + gather at ray indices
  spline           4-knot cubic spline interpolation at 21 times, fwd+bwd
  rng_noise        sigma-noise normal draws at both levels
  STEP_MEASURED    the real jitted multi-step, same process (ms/iter)

Caveat: isolated timings include per-dispatch tunnel latency, so they rank
rather than price components; STEP_MEASURED is the ground truth.

Run (TPU): python tools/perf_breakdown.py [--json_out PERF_r05.json]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVT, N_RGB_PER_POSE, N_POSES = 1024, 53, 19
S_C, S_F = 64, 128
H, W = 400, 600
ROWS = 2 * N_EVT + N_RGB_PER_POSE * N_POSES  # 3055 render rows per level


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
    p.add_argument("--skip_step", action="store_true",
                   help="skip the full-step ground-truth measurement")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benerf_tpu.data import events as events_mod
    from benerf_tpu.models import nerf as nerf_mod
    from benerf_tpu.ops import pallas_mlp_t
    from benerf_tpu.render import pdf as pdf_mod
    from benerf_tpu.render import volume

    key = jax.random.PRNGKey(0)
    results = {}

    # --- ray subset selection, both modes (config.fast_ray_sampling)
    def subset_fast(k):
        k1, k2 = jax.random.split(k)
        _, a = jax.lax.approx_max_k(jax.random.uniform(k1, (H * W,)), N_EVT)
        _, b = jax.lax.approx_max_k(jax.random.uniform(k2, (H * W,)),
                                    N_RGB_PER_POSE)
        return a, b

    def subset_perm(k):
        k1, k2 = jax.random.split(k)
        a = jax.random.permutation(k1, H * W)[:N_EVT]
        b = jax.random.permutation(k2, H * W)[:N_RGB_PER_POSE]
        return a, b

    results["ray_subset_fast"] = timeit(jax.jit(subset_fast), key,
                                        reps=args.reps)
    results["ray_subset_perm"] = timeit(jax.jit(subset_perm), key,
                                        reps=args.reps)

    # --- transposed-kernel input staging: the (8, n) pv build, fwd+bwd,
    # merged per-level shapes (the kernel's only streamed input)
    pts_f = jax.random.normal(key, (ROWS, S_F, 3))
    pts_c = pts_f[:, :S_C]
    vd = jax.random.normal(key, (ROWS, 3))

    def pv_pack(pc, pf, vd_):
        def pack(pts_):
            R, S, _ = pts_.shape
            n = R * S
            pts_T = pts_.reshape(n, 3).T
            vd_T = jnp.broadcast_to(
                vd_[:, None, :], (R, S, 3)).reshape(n, 3).T
            pv = jnp.concatenate(
                [pts_T, vd_T, jnp.zeros((2, n), pts_.dtype)], axis=0)
            return jnp.sum(pv * 1e-6)

        return pack(pc) + pack(pf)

    results["pv_pack"] = timeit(
        jax.jit(jax.grad(pv_pack, argnums=(0, 1, 2))), pts_c, pts_f, vd,
        reps=args.reps,
    )

    # --- fused transposed kernel fwd+bwd at merged per-level point counts
    params = nerf_mod.init_params(jax.random.PRNGKey(1), channels=3,
                                  use_viewdirs=True)

    def kern(p_, pts_, vd_):
        return jnp.sum(pallas_mlp_t.fused_nerf_mlp(p_, pts_, vd_) ** 2)

    g_kern = jax.jit(jax.grad(kern, argnums=(0,)))
    results["mlp_fine"] = timeit(g_kern, params, pts_f, vd, reps=args.reps)
    results["mlp_coarse"] = timeit(g_kern, params, pts_c, vd, reps=args.reps)

    # --- composite fwd+bwd both levels
    raw_c = jax.random.normal(key, (ROWS, S_C, 4))
    raw_f = jax.random.normal(key, (ROWS, S_F, 4))
    z_c = jnp.sort(jax.random.uniform(key, (ROWS, S_C)), axis=-1)
    z_f = jnp.sort(jax.random.uniform(key, (ROWS, S_F)), axis=-1)
    rd = jax.random.normal(key, (ROWS, 3))

    def comp(raw1, raw2):
        a = volume.composite(raw1, z_c, rd, 3, noise_std=0.0)
        b = volume.composite(raw2, z_f, rd, 3, noise_std=0.0)
        return jnp.sum(a["rgb_map"]) + jnp.sum(b["rgb_map"])

    results["composite"] = timeit(
        jax.jit(jax.grad(comp, argnums=(0, 1))), raw_c, raw_f, reps=args.reps
    )

    # --- fine-sample merge: production merge_sorted vs the replaced sort
    zs = jnp.sort(jax.random.uniform(key, (ROWS, S_C)), axis=-1)

    def zmerge(z1, z2):
        return jnp.sum(pdf_mod.merge_sorted(z1, z2) ** 2)

    def zsort(z1, z2):
        return jnp.sum(jnp.sort(jnp.concatenate([z1, z2], -1), -1) ** 2)

    results["z_merge"] = timeit(jax.jit(jax.grad(zmerge)), z_c, zs,
                                reps=args.reps)
    results["z_sort_jnp"] = timeit(jax.jit(jax.grad(zsort)), z_c, zs,
                                   reps=args.reps)

    # --- sample_pdf, production order-statistic sorted draws (no grad path)
    wts = jax.random.uniform(key, (ROWS, S_C - 2))
    zm = z_c[:, :-1]

    def spdf(w_):
        return pdf_mod.sample_pdf(zm, w_, 64, key=key, sorted_draws=True)

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
        return (jax.random.normal(k1, (ROWS, S_C)),
                jax.random.normal(k2, (ROWS, S_F)))

    results["rng_noise"] = timeit(jax.jit(noise), key, reps=args.reps)

    # --- ground truth: the real jitted step in the same process
    step_ms = None
    if not args.skip_step:
        import bench as bench_mod
        from __graft_entry__ import _bench_config

        cfg = _bench_config()
        _, dt = bench_mod.run_step_bench(cfg, H, W, inner=25, chunks=2)
        step_ms = dt * 1e3
        results["STEP_MEASURED"] = step_ms

    iso = {k: v for k, v in results.items()
           if k not in ("STEP_MEASURED", "z_sort_jnp", "ray_subset_perm")}
    total = sum(iso.values())
    print("\ncomponent timings (ms, fwd+bwd where differentiated):")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k:18s} {v:8.3f}")
    extra = f" vs measured step {step_ms:.2f} ms" if step_ms else ""
    print(f"  {'SUM(prod rows)':18s} {total:8.3f}{extra}")
    if args.json_out:
        out = args.json_out if os.path.isabs(args.json_out) else os.path.join(
            REPO, args.json_out)
        with open(out, "w") as f:
            json.dump({"components_ms": results,
                       "sum_production_rows_ms": round(total, 3),
                       "step_measured_ms":
                           round(step_ms, 3) if step_ms else None,
                       "platform": jax.devices()[0].platform}, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
