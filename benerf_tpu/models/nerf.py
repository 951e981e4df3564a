"""NeRF MLP as a pure parameter pytree + functional apply.

Architecture contract (reference /root/reference/model/nerf.py:40-116):
  - 8 trunk layers of width 256 with ReLU; skip concat of the positional
    encoding after trunk layer index 4 (so layer 5 consumes 63+256=319 ch);
  - viewdir branch: alpha head 256->1, feature 256->256,
    concat(feature, view PE 27) -> 128 (ReLU) -> rgb head 128->channels;
  - output = concat([rgb, alpha_raw]) per sample point;
  - weights are Xavier-uniform, biases zero (run_nerf_helpers.py:194-208).

Weight layout is (fan_in, fan_out) so apply is `x @ w + b` — the natural MXU
orientation (points dimension tiles the systolic array's rows).

The skip-layer weight is stored split as `w_pe` (63, W) and `w_h` (W, W) so
kernels never materialize a 319-wide concat; `x @ [wpe; wh] == pe @ wpe + h @ wh`
with the reference's concat order [input_pts, h] (model/nerf.py:98).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from benerf_tpu.models import embedder

Params = Dict[str, Any]


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def init_params(
    key,
    depth: int = 8,
    width: int = 256,
    input_ch: int = 63,
    input_ch_views: int = 27,
    channels: int = 3,
    skips=(4,),
    use_viewdirs: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Initialize one NeRF MLP (coarse or fine)."""
    keys = jax.random.split(key, depth + 4)
    layers = []
    for i in range(depth):
        in_dim = input_ch if i == 0 else width
        if i > 0 and (i - 1) in skips:
            # the layer right after the skip concat: split weight
            layers.append(
                {
                    "w_pe": xavier_uniform(keys[i], (input_ch, width), dtype),
                    # xavier scale for the split layer is computed from the
                    # *full* fan-in (input_ch + width) to match a single
                    # (input_ch+width, width) Xavier matrix.
                    "w_h": None,  # filled below
                    "b": jnp.zeros((width,), dtype),
                }
            )
        else:
            layers.append(
                {
                    "w": xavier_uniform(keys[i], (in_dim, width), dtype),
                    "b": jnp.zeros((width,), dtype),
                }
            )
    # redo split layers with a single xavier draw over the concatenated fan-in
    for i in range(depth):
        if i > 0 and (i - 1) in skips:
            full = xavier_uniform(keys[i], (input_ch + width, width), dtype)
            layers[i] = {
                "w_pe": full[:input_ch],
                "w_h": full[input_ch:],
                "b": jnp.zeros((width,), dtype),
            }

    params: Params = {"pts": layers}
    if use_viewdirs:
        params["feature"] = {
            "w": xavier_uniform(keys[depth], (width, width), dtype),
            "b": jnp.zeros((width,), dtype),
        }
        params["alpha"] = {
            "w": xavier_uniform(keys[depth + 1], (width, 1), dtype),
            "b": jnp.zeros((1,), dtype),
        }
        # views layer consumes concat(feature, view_pe): split weight again
        full = xavier_uniform(keys[depth + 2], (width + input_ch_views, width // 2), dtype)
        params["views"] = {
            "w_feat": full[:width],
            "w_pe": full[width:],
            "b": jnp.zeros((width // 2,), dtype),
        }
        params["rgb"] = {
            "w": xavier_uniform(keys[depth + 3], (width // 2, channels), dtype),
            "b": jnp.zeros((channels,), dtype),
        }
    else:
        params["output"] = {
            "w": xavier_uniform(keys[depth], (width, channels + 1), dtype),
            "b": jnp.zeros((channels + 1,), dtype),
        }
    return params


def apply(
    params: Params,
    pts,
    viewdirs=None,
    *,
    num_freqs: int = 10,
    num_freqs_views: int = 4,
    skips=(4,),
    barf_weights=None,
    barf_weights_views=None,
    compute_dtype=None,
):
    """Evaluate the MLP at sample points.

    Args:
      pts: (..., S, 3) sample positions (any leading batch dims).
      viewdirs: (..., 3) unit view directions, broadcast over S; or None.
      barf_weights[_views]: optional (L,) coarse-to-fine weights.
      compute_dtype: optional dtype for matmul inputs (e.g. jnp.bfloat16);
        accumulation stays float32 via preferred_element_type.
    Returns:
      (..., S, channels+1) raw [rgb..., sigma_raw].
    """
    in_shape = pts.shape
    x = pts.reshape(-1, in_shape[-1])

    pe = embedder.positional_encoding(x, num_freqs, include_input=barf_weights is None)
    if barf_weights is not None:
        pe = embedder.apply_barf_weights(pe, barf_weights, include_input=False)
        pe = jnp.concatenate([x, pe], axis=-1)  # model/nerf.py:80

    def mm(a, w):
        if compute_dtype is not None:
            a = a.astype(compute_dtype)
            w = w.astype(compute_dtype)
            return jnp.dot(a, w, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
        # true fp32 (or fp64 under x64) matmuls: the TPU backend default
        # lowers f32 operands to one bf16 MXU pass; HIGHEST requests the
        # full-precision path. Accumulation dtype follows the operands.
        return jnp.dot(a, w, precision=jax.lax.Precision.HIGHEST)

    h = pe
    for i, layer in enumerate(params["pts"]):
        if "w_pe" in layer:
            h = mm(pe, layer["w_pe"]) + mm(h, layer["w_h"]) + layer["b"]
        else:
            h = mm(h, layer["w"]) + layer["b"]
        h = jax.nn.relu(h)
        # NOTE: reference concats [input_pts, h] after relu of the skip layer
        # (model/nerf.py:94-98); with split weights this is implicit in the
        # next layer's (w_pe, w_h) pair.

    if "views" in params:
        alpha = mm(h, params["alpha"]["w"]) + params["alpha"]["b"]
        feat = mm(h, params["feature"]["w"]) + params["feature"]["b"]

        vshape = viewdirs.shape
        v = viewdirs.reshape(-1, vshape[-1])
        vpe = embedder.positional_encoding(
            v, num_freqs_views, include_input=barf_weights_views is None
        )
        if barf_weights_views is not None:
            vpe = embedder.apply_barf_weights(
                vpe, barf_weights_views, include_input=False
            )
            vpe = jnp.concatenate([v, vpe], axis=-1)
        # broadcast per-ray viewdir PE over samples: (..., 1, Cv) -> flat rows
        samples = x.shape[0] // v.shape[0]
        vpe = jnp.repeat(vpe, samples, axis=0)

        hv = mm(feat, params["views"]["w_feat"]) + mm(vpe, params["views"]["w_pe"])
        hv = jax.nn.relu(hv + params["views"]["b"])
        rgb = mm(hv, params["rgb"]["w"]) + params["rgb"]["b"]
        out = jnp.concatenate([rgb, alpha], axis=-1)
    else:
        out = mm(h, params["output"]["w"]) + params["output"]["b"]

    return out.reshape(in_shape[:-1] + (out.shape[-1],))
