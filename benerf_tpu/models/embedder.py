"""Sinusoidal positional encoding (NeRF-style) + BARF coarse-to-fine weights.

Output layout matches the reference embedder (/root/reference/model/embedder.py):
  [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] with fk = 2**k and the
  identity block present iff include_input (embedder.py:13-31). For the default
  config: positions L=10 -> 63 channels, view dirs L=4 -> 27 channels.

BARF coarse-to-fine (opt-in, off in every shipped config): we weight each
*frequency band* k by (1 - cos(pi clamp(alpha - k, 0, 1))) / 2 as in the BARF
paper. NOTE the reference's barf_c2f_weight (model/nerf.py:16-26) reshapes the
flat [.., 6L] embedding to (-1, L) before weighting, which misaligns weights
with frequency bands for its own layout; we implement the mathematically
intended per-frequency weighting and document the deviation here.
"""

from __future__ import annotations

import jax.numpy as jnp


def out_dim(num_freqs: int, include_input: bool = True, input_dims: int = 3) -> int:
    return input_dims * (2 * num_freqs + (1 if include_input else 0))


def positional_encoding(x, num_freqs: int, include_input: bool = True):
    """(..., D) -> (..., D*(2*num_freqs (+1))) sin/cos features.

    Frequencies are 2**k, k = 0..num_freqs-1 (log-sampling, embedder.py:21).
    """
    feats = [x] if include_input else []
    # (..., D, 1) * (num_freqs,) -> (..., D, num_freqs); keep the reference's
    # per-frequency interleave [sin(fk x), cos(fk x)] by iterating over k.
    for k in range(num_freqs):
        xf = x * (2.0**k)
        feats.append(jnp.sin(xf))
        feats.append(jnp.cos(xf))
    return jnp.concatenate(feats, axis=-1)


def barf_c2f_weights(step, max_iter, num_freqs, start, end):
    """Per-frequency-band BARF weights in [0,1], shape (num_freqs,).

    alpha ramps linearly in `progress` from `start` to `end` of training
    (model/nerf.py:16-26). Differentiable in nothing (step is data).
    """
    progress = step / max_iter
    alpha = (progress - start) / (end - start) * num_freqs
    k = jnp.arange(num_freqs)
    return (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - k, 0.0, 1.0))) / 2.0


def apply_barf_weights(encoded, weights, include_input: bool, input_dims: int = 3):
    """Scale the sin/cos blocks of `positional_encoding` output by per-band w.

    encoded: (..., C) with C = input_dims*(2L (+1)); weights: (L,).
    """
    num_freqs = weights.shape[0]
    offset = input_dims if include_input else 0
    head = encoded[..., :offset]
    bands = encoded[..., offset:]
    shaped = bands.reshape(bands.shape[:-1] + (num_freqs, 2 * input_dims))
    shaped = shaped * weights[..., :, None]
    return jnp.concatenate(
        [head, shaped.reshape(bands.shape)], axis=-1
    )
