"""Convert PyTorch-reference NeRF weights to benerf_tpu param pytrees.

Used for (a) golden-parity tests against recorded reference weights, and
(b) importing reference .tar checkpoints (test.py:98-107 naming) so users can
bring existing training runs into this framework.

torch nn.Linear stores weight as (out, in); our layout is (in, out), so every
matrix transposes. Skip/concat layers are split into (w_pe, w_h) pairs per
models/nerf.py (concat order [input_pts, h], model/nerf.py:98; [feature,
input_views], model/nerf.py:103).
"""

from __future__ import annotations

import jax.numpy as jnp


def nerf_params_from_state_dict(
    sd: dict,
    prefix: str = "",
    depth: int = 8,
    input_ch: int = 63,
    width: int = 256,
    skips=(4,),
):
    """sd maps '<prefix>pts_linears.0.weight' etc. to numpy arrays."""

    def get(name):
        return jnp.asarray(sd[prefix + name])

    layers = []
    for i in range(depth):
        w = get(f"pts_linears.{i}.weight")  # (out, in)
        b = get(f"pts_linears.{i}.bias")
        if i > 0 and (i - 1) in skips:
            layers.append(
                {
                    "w_pe": w[:, :input_ch].T,
                    "w_h": w[:, input_ch:].T,
                    "b": b,
                }
            )
        else:
            layers.append({"w": w.T, "b": b})

    params = {"pts": layers}
    if prefix + "views_linears.0.weight" in sd:
        vw = get("views_linears.0.weight")  # (128, width+views_ch)
        params["feature"] = {"w": get("feature_linear.weight").T,
                             "b": get("feature_linear.bias")}
        params["alpha"] = {"w": get("alpha_linear.weight").T,
                           "b": get("alpha_linear.bias")}
        params["views"] = {
            "w_feat": vw[:, :width].T,
            "w_pe": vw[:, width:].T,
            "b": get("views_linears.0.bias"),
        }
        params["rgb"] = {"w": get("rgb_linear.weight").T,
                         "b": get("rgb_linear.bias")}
    else:
        params["output"] = {"w": get("output_linear.weight").T,
                            "b": get("output_linear.bias")}
    return params


def crf_params_from_state_dict(sd: dict, prefix: str = ""):
    """Convert a ColorToneMapper.mlp_gray / LuminanceToneMapper.mlp_luminance
    nn.Sequential state dict (component.py:48-58,126-135: Linear layers at
    even indices, ReLU between) to models.crf param pytrees."""
    idxs = sorted(
        {int(k[len(prefix):].split(".")[0]) for k in sd if k.startswith(prefix)}
    )
    layers = [
        {"w": jnp.asarray(sd[f"{prefix}{i}.weight"]).T,
         "b": jnp.asarray(sd[f"{prefix}{i}.bias"])}
        for i in idxs
    ]
    return {"layers": layers}
