"""MLP evaluation dispatcher: fused Pallas TPU kernel or pure-jnp fallback.

The NeRF MLP is the hot loop — ~390k point evaluations of a width-256 MLP
per training iteration (SURVEY.md §3.1). The Pallas path fuses positional
encoding + the 8-layer trunk + heads into one kernel so the 63/27-channel
encodings never round-trip through HBM. The jnp path is the reference
implementation used for parity tests, CPU, and as the autodiff fallback.
"""

from __future__ import annotations

import jax

from benerf_tpu.models import nerf as nerf_model


def _pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def mlp_forward(
    params,
    pts,
    viewdirs,
    *,
    num_freqs: int = 10,
    num_freqs_views: int = 4,
    barf_weights=None,
    barf_weights_views=None,
    use_pallas: bool = True,
    compute_dtype: str = "float32",
):
    """Evaluate the NeRF MLP on (..., S, 3) points. See models.nerf.apply."""
    import jax.numpy as jnp

    cd = None if compute_dtype == "float32" else jnp.bfloat16

    if (
        use_pallas
        and barf_weights is None
        and viewdirs is not None
        and _pallas_available()
    ):
        from benerf_tpu.ops import fused_mlp

        if fused_mlp.supports(params, pts):
            return fused_mlp.fused_nerf_mlp(
                params, pts, viewdirs,
                num_freqs=num_freqs,
                num_freqs_views=num_freqs_views,
                compute_dtype=compute_dtype,
            )

    return nerf_model.apply(
        params,
        pts,
        viewdirs,
        num_freqs=num_freqs,
        num_freqs_views=num_freqs_views,
        barf_weights=barf_weights,
        barf_weights_views=barf_weights_views,
        compute_dtype=cd,
    )
