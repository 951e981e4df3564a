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


_FORCE_INTERPRET = False


def force_interpret(enable: bool = True) -> None:
    """Route mlp_forward through the Pallas kernel in interpreter mode on any
    backend (tests + the multichip dryrun exercise the kernel under SPMD on
    the CPU mesh this way)."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = enable
    from benerf_tpu.ops import pallas_mlp, pallas_mlp_t

    pallas_mlp.INTERPRET = enable
    pallas_mlp_t.INTERPRET = enable


def _pallas_available() -> bool:
    if _FORCE_INTERPRET:
        return True
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
    mesh=None,
    data_axis: str = "data",
):
    """Evaluate the NeRF MLP on (..., S, 3) points. See models.nerf.apply.

    mesh: under SPMD the Pallas kernel is wrapped in jax.shard_map with rays
    sharded over `data_axis` and params replicated — XLA cannot partition a
    custom call by itself, so without this the kernel would force an
    all-gather of the ray batch. shard_map's AD inserts the psum that turns
    per-shard weight-gradient partials into the replicated gradient.
    """
    import jax.numpy as jnp

    cd = None if compute_dtype == "float32" else jnp.bfloat16

    if use_pallas and viewdirs is not None and _pallas_available():
        # import stays lazy so non-TPU backends never load Pallas.
        # Preference order: transposed fully-fused kernel (PE + view branch
        # in-kernel, compact (8,n) IO, BARF band weights supported — see
        # pallas_mlp_t.py) > original staged kernel (no BARF) > pure jnp.
        try:
            from benerf_tpu.ops import pallas_mlp, pallas_mlp_t
            if (pallas_mlp_t.supports(params, pts)
                    and num_freqs == 10 and num_freqs_views == 4):
                pallas_mlp = pallas_mlp_t
                ok = True
            else:
                ok = (barf_weights is None
                      and pallas_mlp.supports(params, pts))
        except Exception:
            ok = False
        if ok:
            kernel_kw = dict(
                num_freqs=num_freqs,
                num_freqs_views=num_freqs_views,
                compute_dtype=compute_dtype,
            )
            barf_on = (
                barf_weights is not None or barf_weights_views is not None
            )
            if pallas_mlp is pallas_mlp_t:
                if compute_dtype == "bfloat16":
                    # honest-knob guard (PROFILE_r04.md "A dtype finding"):
                    # on the transposed fully-fused path the MXU already
                    # ingests bf16 at Precision.DEFAULT with f32 accumulation
                    # and no staging arrays exist to narrow, so the flag is
                    # a no-op BY CONSTRUCTION. Warn instead of silently
                    # returning fp32-identical compute.
                    import warnings

                    warnings.warn(
                        "compute_dtype='bfloat16' has no effect on the "
                        "fused-transposed Pallas path (MXU already ingests "
                        "bf16 with f32 accumulation); results are identical "
                        "to float32. The flag still changes the jnp fallback "
                        "and the staged kernel.",
                        stacklevel=2,
                    )
                if not barf_on:
                    kernel_kw.update(
                        barf_weights=None, barf_weights_views=None
                    )
            if mesh is not None and pts.ndim == 3:
                from jax.sharding import PartitionSpec as P

                if pallas_mlp is pallas_mlp_t and barf_on:
                    # BARF band weights are traced values (functions of the
                    # step counter): pass them as explicit replicated
                    # shard_map operands, not closure captures, so the SPMD
                    # partitioner sees them (ADVICE r4 #1).
                    bw = (barf_weights if barf_weights is not None
                          else jnp.ones((num_freqs,)))
                    bwv = (barf_weights_views if barf_weights_views is not None
                           else jnp.ones((num_freqs_views,)))

                    def kernel(params_, pts_, vd_, bw_, bwv_):
                        return pallas_mlp.fused_nerf_mlp(
                            params_, pts_, vd_,
                            barf_weights=bw_, barf_weights_views=bwv_,
                            **kernel_kw,
                        )

                    extra_args = (bw, bwv)
                    extra_specs = (P(), P())
                else:

                    def kernel(params_, pts_, vd_):
                        return pallas_mlp.fused_nerf_mlp(
                            params_, pts_, vd_, **kernel_kw
                        )

                    extra_args = ()
                    extra_specs = ()

                sharded = jax.shard_map(
                    kernel,
                    mesh=mesh,
                    in_specs=(P(), P(data_axis), P(data_axis)) + extra_specs,
                    out_specs=P(data_axis),
                    # pallas_call outputs don't carry varying-mesh-axes
                    # metadata; skip the vma check (shapes are still checked)
                    check_vma=False,
                )
                # shard_map needs the ray axis divisible by the mesh; rays
                # are independent, so pad with copies and slice the result
                R = pts.shape[0]
                pad = (-R) % mesh.shape[data_axis]
                if pad:
                    # pad > R is possible when the ray batch is smaller than
                    # the mesh; tile enough copies before slicing.
                    reps = -(-pad // R) if R else 1
                    pts = jnp.concatenate(
                        [pts, jnp.tile(pts, (reps,) + (1,) * (pts.ndim - 1))[:pad]],
                        axis=0,
                    )
                    viewdirs = jnp.concatenate(
                        [viewdirs,
                         jnp.tile(viewdirs,
                                  (reps,) + (1,) * (viewdirs.ndim - 1))[:pad]],
                        axis=0,
                    )
                out = sharded(params, pts, viewdirs, *extra_args)
                return out[:R] if pad else out
            if pallas_mlp is pallas_mlp_t and barf_on:
                kernel_kw.update(
                    barf_weights=barf_weights,
                    barf_weights_views=barf_weights_views,
                )
            return pallas_mlp.fused_nerf_mlp(params, pts, viewdirs, **kernel_kw)

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
