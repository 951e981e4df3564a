"""Placeholder for the fused Pallas NeRF-MLP kernel (built in a later pass).

Until the kernel lands, supports() is False and the jnp path is used.
"""

from __future__ import annotations


def supports(params, pts) -> bool:
    return False


def fused_nerf_mlp(params, pts, viewdirs, **kwargs):
    raise NotImplementedError
