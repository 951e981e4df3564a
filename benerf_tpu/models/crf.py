"""Camera response function (CRF) tone-mapper MLPs.

Reference: ColorToneMapper / LuminanceToneMapper
(/root/reference/model/component.py:38-149): an MLP 1 -> width -> ... -> 1
with ReLU hidden activations and a final sigmoid; Xavier weights with zero
biases for the color mapper and *ones* biases for the luminance mapper
(component.py:65-78,136-140). Disabled in every shipped config
(optimize_rgb_crf/event_crf = False) but part of the trainable surface.

Only the "Gray" input_type is exercised by the reference drivers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from benerf_tpu.models.nerf import xavier_uniform


def init_params(key, hidden: int = 0, width: int = 128, bias_init: float = 0.0):
    """CRF MLP params: [1->width, (width->width)*hidden, width->1]."""
    sizes = [1, width] + [width] * hidden + [1]
    keys = jax.random.split(key, len(sizes) - 1)
    layers = []
    for i in range(len(sizes) - 1):
        layers.append(
            {
                "w": xavier_uniform(keys[i], (sizes[i], sizes[i + 1])),
                "b": jnp.full((sizes[i + 1],), bias_init, jnp.float32),
            }
        )
    return {"layers": layers}


def apply(params, x):
    """(..., 1) -> (..., 1) tone-mapped value in (0,1) (sigmoid output)."""
    h = x
    layers = params["layers"]
    for layer in layers[:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    h = h @ layers[-1]["w"] + layers[-1]["b"]
    return jax.nn.sigmoid(h)
