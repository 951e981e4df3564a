"""Volume rendering: raw MLP outputs -> composited rgb/depth/acc maps.

Contract (reference NeRF.raw2output, /root/reference/model/nerf.py:118-148):
  dists_k = z_{k+1} - z_k (last gets 1e10), scaled by |rays_d|;
  rgb = sigmoid(raw[..., :C]);
  alpha_k = 1 - exp(-relu(sigma_raw_k + noise_k) * dists_k);
  weights = alpha * cumprod_exclusive(1 - alpha + 1e-10);
  rgb_map = sum_k w_k rgb_k;  depth = sum w z;  disp = 1/max(1e-10, depth/acc);
  acc = sum w.

QUIRK preserved by default: the reference calls raw2output without
raw_noise_std, so its default 1.0 applies Gaussian sigma-noise at *both*
train and eval (model/nerf.py:312-317,330-335 — the config raw_noise_std=0 is
dead). Pass noise_std=0.0 (or key=None) for the deterministic variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exclusive_cumprod_one_minus(alpha, eps=1e-10):
    """cumprod([1, 1-a_0+eps, ...])[:-1] along the sample axis (last)."""
    t = jnp.cumprod(1.0 - alpha + eps, axis=-1)
    return jnp.concatenate([jnp.ones_like(t[..., :1]), t[..., :-1]], axis=-1)


def composite(raw, z_vals, rays_d, channels: int, noise_std: float = 1.0, key=None,
              noise=None):
    """Alpha compositing along each ray.

    Args:
      raw: (..., S, channels+1) MLP outputs [rgb..., sigma_raw].
      z_vals: (..., S) sample depths.
      rays_d: (..., 3) ray directions (not normalized).
      noise_std: sigma regularization noise std; active only when key given.
      key: PRNG key for the sigma noise (None -> deterministic).
      noise: explicit (..., S) sigma-noise values (overrides key; used by
        golden-parity tests that inject recorded draws).
    Returns dict with rgb_map (...,C), disp_map, acc_map, weights, depth_map,
      sigma. Ref: model/nerf.py:118-148.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :channels])
    sigma_raw = raw[..., channels]
    if noise is not None:
        sigma_raw = sigma_raw + noise
    elif key is not None and noise_std > 0.0:
        sigma_raw = sigma_raw + jax.random.normal(key, sigma_raw.shape) * noise_std

    sigma = jax.nn.relu(sigma_raw)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    weights = alpha * exclusive_cumprod_one_minus(alpha)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    return {
        "rgb_map": rgb_map,
        "disp_map": disp_map,
        "acc_map": acc_map,
        "weights": weights,
        "depth_map": depth_map,
        "sigma": sigma,
    }


def stratified_z(key, n_rays, n_samples, near=0.0, far=1.0, t_rand=None):
    """Stratified depth samples in [near, far], always perturbed.

    The reference perturbs unconditionally, ignoring args.perturb
    (model/nerf.py:297-307) — train *and* eval. Pass key=None for the
    unperturbed midpoint-free linspace variant; pass explicit
    t_rand (n_rays, n_samples) to inject recorded perturbation draws.
    """
    t = jnp.linspace(0.0, 1.0, n_samples)
    z = near * (1.0 - t) + far * t
    z = jnp.broadcast_to(z, (n_rays, n_samples))
    if key is None and t_rand is None:
        return z
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
    lower = jnp.concatenate([z[..., :1], mids], axis=-1)
    if t_rand is None:
        t_rand = jax.random.uniform(key, z.shape)
    return lower + (upper - lower) * t_rand
