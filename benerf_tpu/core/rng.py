"""Deterministic PRNG threading.

The reference seeds python/numpy/torch globally (train.py:469-482); we thread
explicit jax.random keys: one root key per run, folded with the step index
inside the jitted train step, then split by named consumer. torch RNG streams
cannot be replicated bit-for-bit in JAX, so golden-parity tests inject
recorded random draws instead of seeds (SURVEY.md §7.3).
"""

from __future__ import annotations

import jax

CONSUMERS = (
    "window",      # event time-window placement
    "ray_evt",     # event-camera ray subset
    "ray_rgb",     # rgb-camera ray subset
    "z_evt",       # stratified coarse depths (event branch)
    "z_rgb",
    "pdf_evt",     # fine-sample uniforms
    "pdf_rgb",
    "noise_evt_c", # sigma noise, event coarse
    "noise_evt_f",
    "noise_rgb_c",
    "noise_rgb_f",
)


def root_key(seed: int):
    return jax.random.PRNGKey(seed)


def step_keys(key, step):
    """Fold the step into the root key and split one subkey per consumer."""
    k = jax.random.fold_in(key, step)
    subkeys = jax.random.split(k, len(CONSUMERS))
    return dict(zip(CONSUMERS, subkeys))
