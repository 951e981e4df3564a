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

import functools

import jax
import jax.numpy as jnp
import numpy as np


def out_dim(num_freqs: int, include_input: bool = True, input_dims: int = 3) -> int:
    return input_dims * (2 * num_freqs + (1 if include_input else 0))


@functools.lru_cache(maxsize=None)
def _pe_consts(num_freqs: int, include_input: bool, D: int):
    """Selector matrix + per-column freq/kind masks for the wide-lane PE."""
    C = out_dim(num_freqs, include_input, D)
    j = np.arange(C)
    off = D if include_input else 0
    block = np.maximum(j - off, 0) // D  # 2k for sin(fk x), 2k+1 for cos(fk x)
    sel = np.zeros((D, C), np.float32)
    sel[j % D, j] = 1.0
    freq = (2.0 ** (block // 2)).astype(np.float32)
    is_id = j < off
    is_sin = (~is_id) & (block % 2 == 0)
    return sel, freq, is_id, is_sin


def positional_encoding(x, num_freqs: int, include_input: bool = True):
    """(..., D) -> (..., D*(2*num_freqs (+1))) sin/cos features.

    Frequencies are 2**k, k = 0..num_freqs-1 (log-sampling, embedder.py:21),
    layout [x, sin(f0 x), cos(f0 x), sin(f1 x), ...].

    TPU note: built via a 0/1 selector matmul so all intermediates are
    lane-wide (n, C) arrays — the naive per-frequency concat materializes
    ~2L narrow (n, 3) arrays whose T(8,128) tiling wastes ~42x HBM
    bandwidth and dominated the step profile. Precision.HIGHEST makes the
    selector matmul bit-exact (operands split losslessly into bf16 triples),
    so numerics match the concat formulation exactly.
    """
    D = x.shape[-1]
    sel, freq, is_id, is_sin = _pe_consts(num_freqs, include_input, D)
    a = jnp.dot(x, sel, precision=jax.lax.Precision.HIGHEST)  # exact copy
    b = a * freq
    return jnp.where(is_id, a, jnp.where(is_sin, jnp.sin(b), jnp.cos(b)))


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
