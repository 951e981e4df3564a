"""Full-frame rendering for eval/test (chunked, static-shaped).

Mirrors Graph.render_video / render_image_test / render_video_test
(/root/reference/model/nerf.py:353-390, run_nerf_helpers.py:117-170): all
H*W rays of a pose, rendered in fixed-size chunks. The final partial chunk is
PADDED to the chunk size so XLA compiles exactly one executable regardless of
H*W (SURVEY.md §7.3 "dynamic shapes at eval").

QUIRK (preserved optionally): the reference's eval path keeps the stratified
z perturbation and sigma noise ON (SURVEY.md §3.2). `deterministic=True`
turns both off for reproducible renders; default False matches reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from benerf_tpu.render import renderer as renderer_mod


@partial(
    jax.jit,
    static_argnames=("settings", "H", "W", "chunk", "deterministic"),
)
def _render_chunks(
    nerf_params, nerf_fine_params, pose, idx_padded, K, settings, H, W,
    chunk, key, deterministic,
):
    n_chunks = idx_padded.shape[0] // chunk

    def body(i, acc):
        rgb_acc, disp_acc, acc_acc = acc
        idx = jax.lax.dynamic_slice_in_dim(idx_padded, i * chunk, chunk)
        if deterministic:
            keys = {}
        else:
            k = jax.random.fold_in(key, i)
            kz, kp, kc, kf = jax.random.split(k, 4)
            keys = {"z": kz, "pdf": kp, "noise_c": kc, "noise_f": kf}
        ret = renderer_mod.render_poses_with_ray_idx(
            nerf_params, nerf_fine_params, pose[None], idx, K, H, W,
            settings, keys=keys,
        )
        rgb_acc = jax.lax.dynamic_update_slice_in_dim(
            rgb_acc, ret["rgb_map"], i * chunk, axis=0
        )
        disp_acc = jax.lax.dynamic_update_slice_in_dim(
            disp_acc, ret["disp_map"], i * chunk, axis=0
        )
        acc_acc = jax.lax.dynamic_update_slice_in_dim(
            acc_acc, ret["acc_map"], i * chunk, axis=0
        )
        return rgb_acc, disp_acc, acc_acc

    n = idx_padded.shape[0]
    init = (
        jnp.zeros((n, settings.channels)),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    rgb, disp, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    return rgb, disp, acc


def render_image(
    params, pose, K, H: int, W: int, settings, chunk: int = 4096,
    key=None, deterministic: bool = False,
):
    """Render one full frame; returns dict of (H, W, ...) numpy arrays."""
    if key is None:
        key = jax.random.PRNGKey(0)
    hw = H * W
    n_pad = (-hw) % chunk
    idx = jnp.concatenate([jnp.arange(hw), jnp.zeros((n_pad,), jnp.int32)])
    rgb, disp, acc = _render_chunks(
        params["nerf"], params["nerf_fine"], jnp.asarray(pose),
        idx, jnp.asarray(K), settings, H, W, chunk, key, deterministic,
    )
    return {
        "rgb": np.asarray(rgb[:hw]).reshape(H, W, -1),
        "disp": np.asarray(disp[:hw]).reshape(H, W),
        "acc": np.asarray(acc[:hw]).reshape(H, W),
    }


def render_trajectory(
    params, poses, K, H, W, settings, chunk=4096, key=None,
    deterministic: bool = False, progress=None,
):
    """Render a sequence of poses; yields per-frame dicts."""
    if key is None:
        key = jax.random.PRNGKey(0)
    for i, pose in enumerate(poses):
        if progress:
            progress(i, len(poses))
        yield render_image(
            params, pose, K, H, W, settings, chunk,
            key=jax.random.fold_in(key, i), deterministic=deterministic,
        )
