"""Inverse-CDF hierarchical ("fine") sampling.

Contract: sample_pdf (/root/reference/run_nerf_helpers.py:74-115) — build a
piecewise-constant pdf over coarse bins from compositing weights, invert its
CDF at uniform (or stratified-deterministic) samples, and linearly
interpolate bin edges. Samples are treated as constants (z_samples.detach(),
model/nerf.py:324) — callers should wrap with lax.stop_gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(bins, weights, n_samples: int, key=None, u=None,
               sorted_draws: bool = False):
    """Draw n_samples per ray from the histogram defined by (bins, weights).

    Args:
      bins: (..., B) bin edge positions (z_vals midpoints).
      weights: (..., B-1) unnormalized bin masses.
      key: PRNG key for uniform draws; if None (and u None) uses the
        deterministic linspace grid (det=True path, run_nerf_helpers.py:82-84).
      u: optional (..., n_samples) explicit uniforms (for golden-value tests,
        mirroring the reference's pytest hook, run_nerf_helpers.py:88-97).
      sorted_draws: draw the uniforms as ORDER STATISTICS (normalized
        exponential spacings) so the returned samples are ascending per ray.
        The sample SET is identical in law to iid uniforms (the reference
        consumes it as a set: concat + sort, model/nerf.py:319-327), and a
        pre-sorted output lets the caller replace that O(S log^2 S) sort
        with a linear merge (render/renderer.py).
    Returns: (..., n_samples) sample positions.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (...,B)

    if u is None:
        if key is None:
            u = jnp.linspace(0.0, 1.0, n_samples)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
        elif sorted_draws:
            # u_(1..n) = (S_1/S_{n+1}, ..., S_n/S_{n+1}), S_k partial sums
            # of iid Exp(1): exactly the ascending order statistics of n
            # iid U(0,1) draws. CDF inversion is monotone, so the output
            # inherits the ordering.
            e = -jnp.log1p(
                -jax.random.uniform(key, cdf.shape[:-1] + (n_samples + 1,))
            )
            c = jnp.cumsum(e, axis=-1)
            u = c[..., :-1] / c[..., -1:]
        else:
            u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    # Batched searchsorted(side="right"): count of cdf entries <= u. A dense
    # (..., B, N) comparison + sum is gather-free and maps cleanly onto the
    # VPU (B, N are ~64; jnp.searchsorted itself only takes 1-D inputs).
    inds = jnp.sum(
        (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2
    )
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    # Gather (cdf, bins) at below/above via one-hot matmuls: TPU gathers
    # along the lane axis serialize (each take_along_axis fusion cost
    # ~1.5ms/iter in the step profile); a batched (N,B)@(B,2) matmul rides
    # the MXU. Precision.HIGHEST keeps the 0/1 contraction bit-exact.
    iota = jnp.arange(cdf.shape[-1])
    oh_below = (below[..., :, None] == iota).astype(cdf.dtype)
    oh_above = (above[..., :, None] == iota).astype(cdf.dtype)
    stacked = jnp.stack([cdf, bins], axis=-1)  # (..., B, 2)
    g_below = jnp.matmul(oh_below, stacked,
                         precision=jax.lax.Precision.HIGHEST)
    g_above = jnp.matmul(oh_above, stacked,
                         precision=jax.lax.Precision.HIGHEST)
    cdf_below, bins_below = g_below[..., 0], g_below[..., 1]
    cdf_above, bins_above = g_above[..., 0], g_above[..., 1]

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def merge_sorted(a, b):
    """Merge two per-ray ASCENDING arrays: (..., S1), (..., S2) -> (..., S1+S2).

    Replaces sort(concat(z_vals, z_samples)) on the fine-sampling path
    (reference model/nerf.py:319-327): both inputs are already sorted
    (stratified z is monotone by construction; sample_pdf(sorted_draws=True)
    returns ascending samples), so each element's output position is its own
    index plus its rank in the other array — two dense compare-sums — and
    the scatter is two exact one-hot MXU matmuls instead of an
    O(S log^2 S) sort network. Ties break a-before-b, giving a valid
    permutation. Inputs are treated as constants on the gradient path
    (callers stop_gradient z; z_vals carries no parameters).
    """
    S1, S2 = a.shape[-1], b.shape[-1]
    M = S1 + S2
    cnt_a = jnp.sum(
        (b[..., None, :] < a[..., :, None]).astype(jnp.int32), axis=-1
    )
    pos_a = jnp.arange(S1) + cnt_a
    cnt_b = jnp.sum(
        (a[..., None, :] <= b[..., :, None]).astype(jnp.int32), axis=-1
    )
    pos_b = jnp.arange(S2) + cnt_b
    iota = jnp.arange(M)
    oh_a = (pos_a[..., :, None] == iota).astype(a.dtype)
    oh_b = (pos_b[..., :, None] == iota).astype(b.dtype)
    hi = jax.lax.Precision.HIGHEST
    return (
        jnp.einsum("...sm,...s->...m", oh_a, a, precision=hi)
        + jnp.einsum("...sm,...s->...m", oh_b, b, precision=hi)
    )
