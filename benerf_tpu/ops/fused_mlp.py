"""Fused Pallas TPU kernel for the NeRF MLP hot path (PE + trunk + heads).

Implemented in benerf_tpu/ops/pallas_mlp.py; this module provides the
dispatch predicate so callers can feature-test without importing Pallas on
non-TPU backends.
"""

from __future__ import annotations


def supports(params, pts) -> bool:
    try:
        from benerf_tpu.ops import pallas_mlp

        return pallas_mlp.supports(params, pts)
    except Exception:
        return False


def fused_nerf_mlp(params, pts, viewdirs, **kwargs):
    from benerf_tpu.ops import pallas_mlp

    return pallas_mlp.fused_nerf_mlp(params, pts, viewdirs, **kwargs)
