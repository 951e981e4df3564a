"""BeNeRF losses: event log-brightness-difference + blur-synthesis RGB MSE.

Contract (reference /root/reference/train.py:204-331):
  event (synthetic, threshold C > 0):
      MSE( log I(t_end) - log I(t_start),  ETA * C ) * event_coeff_syn
  event (real, threshold == -1):
      MSE( normalize(dlog I), normalize(ETA) ) * event_coeff_real, where
      normalize divides by the L2 norm over the RAY axis (train.py:243-248);
  rgb: MSE( mean over the N virtual poses of rendered sharp rays,
            observed blurry pixels ) * rgb_coeff;
  both applied to BOTH coarse (rgb0) and fine (rgb_map) outputs.

Brightness log maps (utils/math_utils.py:4-23): safe_log for BeNeRF_* data,
lin_log (linear below 20/255) for E2NeRF_*.
"""

from __future__ import annotations

import jax.numpy as jnp

GRAY_WEIGHTS = jnp.asarray([0.299, 0.587, 0.114])  # utils/img_utils.py:7-16


def rgb_to_gray(rgb):
    """(..., 3) -> (..., 1) ITU-R BT.601 luma."""
    return jnp.sum(rgb * GRAY_WEIGHTS, axis=-1, keepdims=True)


def safe_log(x, eps: float = 1e-9):
    return jnp.log(x + eps)


def lin_log(color, linlog_thres: float = 20.0):
    """Linear below threshold (on a 0..255 scale), log above.

    Ref: utils/math_utils.py:7-11.
    """
    c = color * 255.0
    lin_slope = jnp.log(jnp.asarray(linlog_thres) + 1e-9) / linlog_thres
    return jnp.where(c < linlog_thres, lin_slope * c, jnp.log(c + 1e-9))


def brightness_log(x, dataset: str):
    """rgb2brightlog dispatch (utils/math_utils.py:18-23)."""
    if dataset in ("BeNeRF_Blender", "BeNeRF_Unreal"):
        return safe_log(x)
    elif dataset in ("E2NeRF_Synthetic", "E2NeRF_Real"):
        return lin_log(x)
    raise ValueError(f"no brightness log map for dataset {dataset!r}")


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def event_loss_term(
    bright_start,
    bright_end,
    eta_target,
    *,
    dataset: str,
    channels: int,
    event_threshold: float,
    coeff_syn: float,
    coeff_real: float,
):
    """One event-loss term (coarse OR fine).

    Args:
      bright_start/bright_end: (R, C) rendered intensities at the window
        endpoints (linear domain, pre-log).
      eta_target: (R, 1) accumulated polarities at the sampled pixels.
    Ref: train.py:204-296.
    """
    if channels == 3:
        bright_start = rgb_to_gray(bright_start)
        bright_end = rgb_to_gray(bright_end)
    b1 = brightness_log(bright_start, dataset)
    b2 = brightness_log(bright_end, dataset)
    diff = b2 - b1

    if event_threshold > 0:  # synthetic
        return mse(diff, eta_target * event_threshold) * coeff_syn
    # real: compare directions after L2-normalizing over the ray axis
    diff_n = diff / (jnp.linalg.norm(diff, axis=0, keepdims=True) + 1e-9)
    tgt_n = eta_target / (jnp.linalg.norm(eta_target, axis=0, keepdims=True) + 1e-9)
    return mse(diff_n, tgt_n) * coeff_real


def blur_rgb_loss_term(rgb_per_pose, target, rgb_coeff: float):
    """Synthesized-blur MSE for one output level.

    Args:
      rgb_per_pose: (P*R, C) pose-major rendered rays (P virtual poses).
      target: (R, C) observed blurry pixels.
    Ref: train.py:298-331 (the running-sum loop == mean over poses).
    """
    R = target.shape[0]
    P = rgb_per_pose.shape[0] // R
    synth = jnp.mean(rgb_per_pose.reshape(P, R, -1), axis=0)
    return mse(synth, target) * rgb_coeff
