"""Pinhole ray generation and NDC reparameterization.

Camera convention (OpenGL-style, matching the reference):
  dir_cam = [(i - cx)/fx, -(j - cy)/fy, -1] for pixel column i, row j
  (run_nerf_helpers.py:13-44); rays_d = R @ dir_cam, rays_o = t of the
  camera-to-world pose [R|t].

Pixel indices are *integers* (no half-pixel offset), exactly as the reference.

The optional fisheye remap (TUM_VIE) substitutes undistorted (i, j) float
coordinates looked up from a precomputed (H, W, 2) table
(run_nerf_helpers.py:17-23, model/nerf.py:247-250).
"""

from __future__ import annotations

import jax.numpy as jnp


def rays_for_pixels(i, j, K, c2w):
    """Per-pixel rays for pose(s).

    Args:
      i, j: (N,) pixel x (column) and y (row) coordinates (float or int).
      K: (3,3) intrinsics.
      c2w: (N,3,4) or (3,4) camera-to-world pose(s).
    Returns:
      rays_o, rays_d: (N,3) each. Ref: run_nerf_helpers.py:35-44.
    """
    i = jnp.asarray(i, jnp.float32)
    j = jnp.asarray(j, jnp.float32)
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)],
        axis=-1,
    )  # (N,3)
    rays_d = jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], dirs)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def rays_from_flat_idx(ray_idx, W, K, c2w, remap=None):
    """Rays for flat pixel indices into an H*W image.

    j = idx // W (row), i = idx % W (column) (model/nerf.py:244-245). If
    `remap` (H*W, 2) float undistort LUT is given, (i, j) are replaced by the
    looked-up undistorted coordinates (model/nerf.py:247-250).
    """
    j = ray_idx // W
    i = ray_idx % W
    if remap is not None:
        flat = remap.reshape(-1, 2)[ray_idx]
        i = flat[..., 0]
        j = flat[..., 1]
    return rays_for_pixels(i, j, K, c2w)


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """Shift rays to the near plane and project to NDC space.

    Ref: run_nerf_helpers.py:46-71 (standard NeRF NDC). Note the reference
    applies NDC unconditionally: config.py:109 declares --ndc type=bool
    default=True and any config string parses truthy, so every shipped run
    uses NDC; we expose it as a real boolean but default True.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox / oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -1.0 / (W / (2.0 * focal)) * (dx / dz - ox / oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
