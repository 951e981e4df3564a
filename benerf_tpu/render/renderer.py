"""Hierarchical coarse+fine volume renderer (the forward graph).

Mirrors Graph.render (/root/reference/model/nerf.py:236-343) as a pure
function: rays -> {rgb_map, disp_map, acc_map, rgb0, disp0, acc0, sigma}.

TPU-first notes:
  - everything is static-shaped; eval renders pad to a fixed chunk so XLA
    compiles exactly one program per (chunk, settings) pair;
  - the MLP evaluation goes through benerf_tpu.ops.mlp which dispatches to a
    fused Pallas kernel on TPU or the pure-jnp path elsewhere;
  - fine z-samples are stop_gradient'ed like the reference's .detach()
    (model/nerf.py:324).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from benerf_tpu.render import pdf as pdfm
from benerf_tpu.render import rays as raysm
from benerf_tpu.render import volume
from benerf_tpu.ops import mlp as mlp_ops


@dataclass(frozen=True)
class RenderSettings:
    """Static (hashable) rendering configuration, jit-safe as a closure."""

    n_samples: int = 64
    n_importance: int = 64
    channels: int = 3
    multires: int = 10
    multires_views: int = 4
    use_viewdirs: bool = True
    ndc: bool = True
    near: float = 0.0
    far: float = 1.0
    sigma_noise_std: float = 1.0  # reference quirk: on at train AND eval
    use_pallas: bool = True
    compute_dtype: str = "float32"
    use_barf_c2f: bool = False
    barf_c2f_start: float = 0.1
    barf_c2f_end: float = 0.5
    max_iter: int = 80000

    @classmethod
    def from_config(cls, cfg) -> "RenderSettings":
        return cls(
            n_samples=cfg.N_samples,
            n_importance=cfg.N_importance,
            channels=cfg.channels,
            multires=cfg.multires,
            multires_views=cfg.multires_views,
            use_viewdirs=cfg.use_viewdirs,
            ndc=cfg.ndc,
            sigma_noise_std=cfg.sigma_noise_std,
            use_pallas=cfg.use_pallas,
            compute_dtype=cfg.compute_dtype,
            use_barf_c2f=cfg.use_barf_c2f,
            barf_c2f_start=cfg.barf_c2f_start,
            barf_c2f_end=cfg.barf_c2f_end,
            max_iter=cfg.max_iter,
        )


def _barf_weights(settings: RenderSettings, step):
    if not settings.use_barf_c2f or step is None:
        return None, None
    from benerf_tpu.models import embedder

    w = embedder.barf_c2f_weights(
        step, settings.max_iter, settings.multires,
        settings.barf_c2f_start, settings.barf_c2f_end,
    )
    wv = embedder.barf_c2f_weights(
        step, settings.max_iter, settings.multires_views,
        settings.barf_c2f_start, settings.barf_c2f_end,
    )
    return w, wv


def render_ray_families(
    nerf_params,
    nerf_fine_params,
    families,
    settings: RenderSettings,
    step=None,
    mesh=None,
):
    """Render several independent ray batches through ONE coarse+fine pass.

    TPU motivation (PROFILE_r04.md "next level"): the train step renders two
    ray families per iteration — event rays and RGB rays — and a separate
    hierarchical render per family costs 4 fused-MLP custom calls with their
    staging/dependency chains. All per-ray math here is family-local except
    the MLP itself, so the families are concatenated along the ray axis
    right before each MLP call (one coarse + one fine pallas_call total) and
    split right after; numerics per ray are identical to rendering each
    family alone (exactness test: tests/test_render.py).

    Args:
      families: list of dicts {rays_o (R,3), rays_d (R,3), H, W, focal,
        keys} — H/W/focal drive the per-camera NDC warp; `keys` as in
        render_rays (PRNG keys or injected golden draws, per family).
    Returns a list of per-family output dicts (model/nerf.py:336-342).
    """
    n_fam = len(families)
    keys_list = [f.get("keys") or {} for f in families]
    R_list = [f["rays_o"].shape[0] for f in families]

    viewdirs_l, rays_d_l, z_vals_l, pts_l = [], [], [], []
    for f, keys in zip(families, keys_list):
        rays_o, rays_d = f["rays_o"], f["rays_d"]
        if settings.use_viewdirs:
            vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        else:
            vd = None
        if settings.ndc:
            rays_o, rays_d = raysm.ndc_rays(
                f["H"], f["W"], f["focal"], 1.0, rays_o, rays_d
            )
        z_vals = volume.stratified_z(
            keys.get("z"), rays_o.shape[0], settings.n_samples,
            settings.near, settings.far, t_rand=keys.get("z_u"),
        )
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
        viewdirs_l.append(vd)
        rays_d_l.append(rays_d)
        z_vals_l.append(z_vals)
        pts_l.append((rays_o, pts))

    bw, bwv = _barf_weights(settings, step)

    def run_split(params, pts_list, vd_list):
        """One MLP call over all families. Off-mesh this is a plain concat +
        single kernel; under SPMD the concat happens inside the shard_map
        region on local shards so no resharding collectives appear (see
        ops.mlp.mlp_forward_families)."""
        return mlp_ops.mlp_forward_families(
            params,
            list(zip(pts_list, vd_list)),
            num_freqs=settings.multires,
            num_freqs_views=settings.multires_views,
            barf_weights=bw,
            barf_weights_views=bwv,
            use_pallas=settings.use_pallas,
            compute_dtype=settings.compute_dtype,
            mesh=mesh,
        )

    raws = run_split(nerf_params, [p for _, p in pts_l], viewdirs_l)

    outs = []
    coarse_l, z_all_l, fine_pts_l = [], [], []
    for i in range(n_fam):
        keys = keys_list[i]
        z_vals = z_vals_l[i]
        rays_d = rays_d_l[i]
        coarse = volume.composite(
            raws[i], z_vals, rays_d, settings.channels,
            noise_std=settings.sigma_noise_std, key=keys.get("noise_c"),
            noise=keys.get("noise_c_vals"),
        )
        coarse_l.append(coarse)
        out = {
            "rgb_map": coarse["rgb_map"],
            "disp_map": coarse["disp_map"],
            "acc_map": coarse["acc_map"],
        }
        outs.append(out)
        if settings.n_importance > 0:
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            injected_u = keys.get("pdf_u")
            z_samples = pdfm.sample_pdf(
                z_mid, coarse["weights"][..., 1:-1], settings.n_importance,
                key=keys.get("pdf"), u=injected_u,
                sorted_draws=injected_u is None,
            )
            z_samples = jax.lax.stop_gradient(z_samples)  # model/nerf.py:324
            if injected_u is None:
                # z_vals monotone by construction, z_samples ascending
                # (order-statistic draws): linear merge instead of a sort
                # network. Injected-draw (golden parity) paths keep the
                # reference's sort semantics verbatim.
                z_all = pdfm.merge_sorted(z_vals, z_samples)
            else:
                z_all = jnp.sort(
                    jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1
                )
            rays_o = pts_l[i][0]
            fine_pts_l.append(
                rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
            )
            z_all_l.append(z_all)

    if settings.n_importance > 0:
        raws_fine = run_split(nerf_fine_params, fine_pts_l, viewdirs_l)
        for i in range(n_fam):
            keys = keys_list[i]
            coarse = coarse_l[i]
            fine = volume.composite(
                raws_fine[i], z_all_l[i], rays_d_l[i], settings.channels,
                noise_std=settings.sigma_noise_std, key=keys.get("noise_f"),
                noise=keys.get("noise_f_vals"),
            )
            outs[i].update(
                rgb0=coarse["rgb_map"],
                disp0=coarse["disp_map"],
                acc0=coarse["acc_map"],
                sigma=fine["sigma"],
                rgb_map=fine["rgb_map"],
                disp_map=fine["disp_map"],
                acc_map=fine["acc_map"],
            )
    return outs


def render_rays(
    nerf_params,
    nerf_fine_params,
    rays_o,
    rays_d,
    settings: RenderSettings,
    H: int,
    W: int,
    focal,
    keys: Optional[dict] = None,
    step=None,
    mesh=None,
):
    """Render a batch of rays through the coarse+fine pipeline.

    Args:
      rays_o, rays_d: (R, 3) world-space ray origins/directions.
      H, W, focal: for the NDC warp (of the camera these rays belong to).
      keys: dict with optional PRNG keys {"z", "pdf", "noise_c", "noise_f"};
        None or missing entries select the deterministic variant. Explicit
        recorded draws can be injected instead of keys via {"z_u": (R,S)
        stratification uniforms, "pdf_u": (R,N_imp) inverse-CDF uniforms,
        "noise_c_vals"/"noise_f_vals": (R,S) sigma-noise values} — used by the
        golden gradient-parity tests against the torch reference.
    Returns dict of per-ray maps; rgb0/... are the coarse outputs
      (model/nerf.py:336-342).
    """
    return render_ray_families(
        nerf_params,
        nerf_fine_params,
        [dict(rays_o=rays_o, rays_d=rays_d, H=H, W=W, focal=focal,
              keys=keys)],
        settings,
        step=step,
        mesh=mesh,
    )[0]


def render_poses_with_ray_idx(
    nerf_params,
    nerf_fine_params,
    poses,
    ray_idx,
    K,
    H: int,
    W: int,
    settings: RenderSettings,
    keys=None,
    remap=None,
    step=None,
    mesh=None,
):
    """Training-path rendering: every pose sees the same pixel subset.

    Output rows are pose-major: [pose0 x all idx, pose1 x all idx, ...]
    (model/nerf.py:241-254) — the loss slicing relies on this layout.

    Args:
      poses: (P, 3, 4); ray_idx: (R,) flat pixel indices.
    """
    fam = _pose_family(poses, ray_idx, K, H, W, keys, remap)
    return render_ray_families(
        nerf_params, nerf_fine_params, [fam], settings, step=step, mesh=mesh,
    )[0]


def _pose_family(poses, ray_idx, K, H, W, keys, remap):
    P = poses.shape[0]
    R = ray_idx.shape[0]
    idx_tiled = jnp.tile(ray_idx, P)  # (P*R,)
    poses_tiled = jnp.repeat(poses, R, axis=0)  # (P*R,3,4)
    rays_o, rays_d = raysm.rays_from_flat_idx(idx_tiled, W, K, poses_tiled, remap)
    return dict(rays_o=rays_o, rays_d=rays_d, H=H, W=W, focal=K[0, 0],
                keys=keys)


def render_pose_families_with_ray_idx(
    nerf_params,
    nerf_fine_params,
    fam_specs,
    settings: RenderSettings,
    step=None,
    mesh=None,
):
    """Training-path rendering of several (poses, ray_idx) families through
    one joint coarse+fine pass (2 fused-MLP calls per step instead of
    2 per family — see render_ray_families).

    fam_specs: list of dicts {poses, ray_idx, K, H, W, keys, remap}.
    Returns a list of per-family output dicts, rows pose-major per family.
    """
    fams = [
        _pose_family(s["poses"], s["ray_idx"], s["K"], s["H"], s["W"],
                     s.get("keys"), s.get("remap"))
        for s in fam_specs
    ]
    return render_ray_families(
        nerf_params, nerf_fine_params, fams, settings, step=step, mesh=mesh,
    )
