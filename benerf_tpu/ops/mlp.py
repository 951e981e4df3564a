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


def mlp_forward_families(
    params,
    families,
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
    """Evaluate the MLP on several independent ray families with ONE kernel
    call, SPMD-correctly.

    families: list of (pts (R_i, S, 3), viewdirs (R_i, 3) or None).
    Returns a list of (R_i, S, C+1) raw outputs.

    Why not concatenate outside: under a mesh each family is block-sharded
    over the ray axis, and concatenating two block-sharded arrays misaligns
    rows with devices — XLA inserts all-to-all reshards (caught by
    scaling.py's collective accounting in round 5). Here each family is a
    separate replicate-padded shard_map operand and the concatenation
    happens INSIDE the shard region on local shards: zero communication,
    same single fused kernel launch per device.
    """
    import jax.numpy as jnp

    cd = None if compute_dtype == "float32" else jnp.bfloat16
    kw = dict(
        num_freqs=num_freqs,
        num_freqs_views=num_freqs_views,
        barf_weights=barf_weights,
        barf_weights_views=barf_weights_views,
        use_pallas=use_pallas,
        compute_dtype=compute_dtype,
        mesh=mesh,
        data_axis=data_axis,
    )
    if len(families) == 1:
        pts, vd = families[0]
        return [mlp_forward(params, pts, vd, **kw)]

    kernel_ok = False
    if (use_pallas and mesh is not None and families[0][1] is not None
            and _pallas_available()):
        try:
            from benerf_tpu.ops import pallas_mlp_t

            kernel_ok = (pallas_mlp_t.supports(params, families[0][0])
                         and num_freqs == 10 and num_freqs_views == 4)
        except Exception:
            kernel_ok = False

    if mesh is None or families[0][1] is None:
        # single-device (or no-viewdirs) fallback: one concatenated call —
        # per-row numerics identical, no sharding concerns off-mesh
        pts = jnp.concatenate([f[0] for f in families], axis=0)
        vd = (None if families[0][1] is None
              else jnp.concatenate([f[1] for f in families], axis=0))
        raw = mlp_forward(params, pts, vd, **kw)
        outs, off = [], 0
        for f in families:
            r = f[0].shape[0]
            outs.append(raw[off : off + r])
            off += r
        return outs

    from jax.sharding import PartitionSpec as P

    if kernel_ok:
        from benerf_tpu.ops import pallas_mlp_t

        if compute_dtype == "bfloat16":
            import warnings

            warnings.warn(
                "compute_dtype='bfloat16' has no effect on the "
                "fused-transposed Pallas path (MXU already ingests bf16 "
                "with f32 accumulation); results are identical to float32.",
                stacklevel=2,
            )

    n_dev = mesh.shape[data_axis]
    padded, orig_R = [], []
    for pts, vd in families:
        R = pts.shape[0]
        orig_R.append(R)
        pad = (-R) % n_dev
        if pad:
            reps = -(-pad // R) if R else 1
            pts = jnp.concatenate(
                [pts, jnp.tile(pts, (reps,) + (1,) * (pts.ndim - 1))[:pad]],
                axis=0,
            )
            vd = jnp.concatenate(
                [vd, jnp.tile(vd, (reps,) + (1,) * (vd.ndim - 1))[:pad]],
                axis=0,
            )
        padded.extend([pts, vd])

    barf_on = barf_weights is not None or barf_weights_views is not None
    extra_args = ()
    extra_specs = ()
    if barf_on:
        bw = (barf_weights if barf_weights is not None
              else jnp.ones((num_freqs,)))
        bwv = (barf_weights_views if barf_weights_views is not None
               else jnp.ones((num_freqs_views,)))
        extra_args = (bw, bwv)
        extra_specs = (P(), P())
    F = len(families)

    def kernel(params_, *args):
        pv = args[: 2 * F]
        bw_ = args[2 * F] if barf_on else None
        bwv_ = args[2 * F + 1] if barf_on else None
        # local (per-shard) concat: no communication
        pts_loc = jnp.concatenate(pv[0::2], axis=0)
        vd_loc = jnp.concatenate(pv[1::2], axis=0)
        if kernel_ok:
            raw = pallas_mlp_t.fused_nerf_mlp(
                params_, pts_loc, vd_loc,
                num_freqs=num_freqs, num_freqs_views=num_freqs_views,
                compute_dtype=compute_dtype,
                barf_weights=bw_, barf_weights_views=bwv_,
            )
        else:
            # jnp body under the same shard_map: keeps the partitioned HLO
            # free of per-ray resharding on the fallback path too (the
            # collective accounting in scaling.py compiles this path)
            raw = nerf_model.apply(
                params_, pts_loc, vd_loc,
                num_freqs=num_freqs, num_freqs_views=num_freqs_views,
                barf_weights=bw_, barf_weights_views=bwv_,
                compute_dtype=cd,
            )
        outs_loc, off = [], 0
        for i in range(F):
            r = pv[2 * i].shape[0]
            outs_loc.append(raw[off : off + r])
            off += r
        return tuple(outs_loc)

    sharded = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(),) + (P(data_axis),) * (2 * F) + extra_specs,
        out_specs=(P(data_axis),) * F,
        check_vma=False,
    )
    outs = sharded(params, *padded, *extra_args)
    return [o[:r] for o, r in zip(outs, orig_R)]
