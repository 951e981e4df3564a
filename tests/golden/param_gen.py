"""Deterministic NeRF weight synthesis shared by the golden-fixture
generator (which loads the values into the torch reference's modules) and
the parity tests / x64 child (which load the *same* values into jax params).

Parity only requires that both frameworks evaluate the identical function on
identical parameters — the weights are inputs, not compared tensors — so
synthesizing them from a case-keyed numpy RNG keeps ~40 MB of MLP weights
out of the committed fixture (advisor r2/r3 finding). Values follow the
reference's Xavier-uniform shape scaling (run_nerf_helpers.py:194-204) and
are always drawn in float32 (then cast) so the f64 fixtures see exactly
float32-representable parameters.
"""

from __future__ import annotations

import zlib

import numpy as np

WIDTH = 256
INPUT_CH = 63
VIEWS_IN = INPUT_CH // 63 * 0 + 27 + WIDTH  # 283: concat(feature, view-PE)
SKIP_IN = WIDTH + INPUT_CH                  # 319: concat(h, input) at skip


def _layer_dims(channels: int):
    """torch state-dict entries (name -> (out, in)) of the reference NeRF
    (model/nerf.py:40-65): 8 trunk Linears w/ skip concat at index 5,
    views branch, feature/alpha/rgb heads."""
    dims = {}
    for i in range(8):
        fan_in = INPUT_CH if i == 0 else (SKIP_IN if i == 5 else WIDTH)
        dims[f"pts_linears.{i}.weight"] = (WIDTH, fan_in)
        dims[f"pts_linears.{i}.bias"] = (WIDTH,)
    dims["views_linears.0.weight"] = (WIDTH // 2, VIEWS_IN)
    dims["views_linears.0.bias"] = (WIDTH // 2,)
    dims["feature_linear.weight"] = (WIDTH, WIDTH)
    dims["feature_linear.bias"] = (WIDTH,)
    dims["alpha_linear.weight"] = (1, WIDTH)
    dims["alpha_linear.bias"] = (1,)
    dims["rgb_linear.weight"] = (channels, WIDTH // 2)
    dims["rgb_linear.bias"] = (channels,)
    return dims


def nerf_state_dict(case: str, tag: str, channels: int, f64: bool = False):
    """Synthesized torch-layout state dict for fixture case `case`, net
    `tag` in {"nerf", "nerf_fine"}."""
    seed = zlib.crc32(f"{case}::{tag}".encode()) % (2**31)
    rng = np.random.default_rng(seed)
    dt = np.float64 if f64 else np.float32
    sd = {}
    for name, shape in _layer_dims(channels).items():
        if name.endswith("bias"):
            # small nonzero biases so bias gradients are exercised generically
            vals = rng.uniform(-0.05, 0.05, shape).astype(np.float32)
        else:
            fan_out, fan_in = shape
            a = np.sqrt(6.0 / (fan_in + fan_out))
            vals = rng.uniform(-a, a, shape).astype(np.float32)
        sd[name] = vals.astype(dt)
    return sd
