"""The jitted BeNeRF train step: one function, whole iteration on device.

Replaces the reference's Python-side iteration (train.py:153-394): event
window selection, ETA accumulation, spline pose interpolation, ray sampling,
two hierarchical renders (event x2 poses, rgb x N poses), both losses,
backward, and all five optimizer updates — traced once, compiled once.

Host <-> device traffic per step: a PRNG key + step counter. Everything else
(the event stream, the blurry image) lives on device across steps.

Sharding: rays are the data axis. Under a Mesh, per-ray tensors get
with_sharding_constraint(P("data")) right after ray generation; parameters
stay replicated and XLA SPMD inserts the gradient all-reduce (overlapped
with the backward pass by the XLA scheduler) — see parallel/mesh.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from benerf_tpu.core import rng as rng_mod
from benerf_tpu.data import events as events_mod
from benerf_tpu.geometry import spline as spline_mod
from benerf_tpu.models import crf as crf_mod
from benerf_tpu.models import nerf as nerf_mod
from benerf_tpu.render import renderer as renderer_mod
from benerf_tpu.train import loss as loss_mod
from benerf_tpu.train import optim as optim_mod


class SceneBatch(NamedTuple):
    """Device-resident training data for one scene (static across steps)."""

    events: events_mod.EventArrays
    image_flat: jax.Array      # (H*W, C) observed blurry image
    rgb_exp_ts: jax.Array      # (2,) normalized exposure interval
    K_rgb: jax.Array           # (3,3)
    K_evt: jax.Array           # (3,3)
    img_remap: Optional[jax.Array] = None  # (H*W, 2) undistort LUT or None
    evt_remap: Optional[jax.Array] = None


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def build_params(cfg, key, init_knots=None, init_transform=None):
    """All trainable collections, mirroring Model.build_network
    (model/optimize.py:11-34): knots ~ U(0, 0.01), transform = 0, NeRF MLPs
    Xavier/zero, CRFs Xavier with zero (rgb) / one (event) biases."""
    k_nerf, k_fine, k_knots, k_rgb_crf, k_evt_crf = jax.random.split(key, 5)
    params = {
        "nerf": nerf_mod.init_params(
            k_nerf, depth=cfg.netdepth, width=cfg.netwidth,
            channels=cfg.channels, use_viewdirs=True,
        ),
        "nerf_fine": nerf_mod.init_params(
            k_fine, depth=cfg.netdepth_fine, width=cfg.netwidth_fine,
            channels=cfg.channels, use_viewdirs=True,
        ),
        "knots": (
            jnp.asarray(init_knots)
            if init_knots is not None
            else jax.random.uniform(k_knots, (4, 6)) * 0.01
        ),
        "transform": (
            jnp.asarray(init_transform)
            if init_transform is not None
            else jnp.zeros((6,))
        ),
        "rgb_crf": crf_mod.init_params(
            k_rgb_crf, cfg.rgb_crf_net_hidden, cfg.rgb_crf_net_width,
            bias_init=0.0,
        ),
        "event_crf": crf_mod.init_params(
            k_evt_crf, cfg.event_crf_net_hidden, cfg.event_crf_net_width,
            bias_init=1.0,
        ),
    }
    return params


def init_state(cfg, key, tx=None, **kw) -> TrainState:
    params = build_params(cfg, key, **kw)
    tx = tx or optim_mod.build_optimizer(cfg)
    return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))


def _apply_crf(crf_params, x):
    """Elementwise 1->1 CRF applied per channel (component.py:80-102)."""
    shp = x.shape
    return crf_mod.apply(crf_params, x.reshape(-1, 1)).reshape(shp)


def make_train_step(cfg, H: int, W: int, mesh=None, tx=None):
    """Build the jitted step function for image size (H, W).

    Returns step_fn(state, batch, root_key) -> (state, metrics).
    """
    body = _make_step_body(cfg, H, W, mesh=mesh, tx=tx)

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch: SceneBatch, root_key):
        return body(state, batch, root_key)

    return step_fn


def make_multi_step(cfg, H: int, W: int, n_inner: int, mesh=None, tx=None):
    """n_inner full train steps per dispatch via lax.scan (device-side loop).

    The whole iteration is device-resident, so scanning amortizes host->device
    dispatch latency (significant when the chip sits behind an RPC tunnel)
    and lets XLA overlap step boundaries. Returns the final state plus the
    full stacked metrics (each leaf shaped (n_inner,)) so the training loop
    can log per-iteration loss curves, matching the reference's per-iter
    wandb scalars (train.py:219-337).
    """
    body = _make_step_body(cfg, H, W, mesh=mesh, tx=tx)

    @partial(jax.jit, donate_argnums=(0,))
    def multi_fn(state: TrainState, batch: SceneBatch, root_key):
        def scan_body(carry, _):
            new_state, metrics = body(carry, batch, root_key)
            return new_state, metrics

        state2, metrics_stack = jax.lax.scan(
            scan_body, state, xs=None, length=n_inner
        )
        return state2, metrics_stack

    return multi_fn


def make_loss_fn(cfg, H: int, W: int, shard=None, mesh=None):
    """Build (loss_fn, draw_fn) for one iteration's loss.

    loss_fn(params, batch, draws, step) -> (total, metrics) is pure given the
    `draws` dict; draw_fn(keys) produces that dict from the per-step PRNG
    keys. Splitting the two lets golden-parity tests inject the *recorded*
    random draws of the torch reference (window bounds, ray indices,
    stratification/inverse-CDF uniforms) and compare loss AND gradients
    through the exact production code path (train.py:204-331).
    """
    settings = renderer_mod.RenderSettings.from_config(cfg)

    H_evt, W_evt = cfg.event_height, cfg.event_width
    hw_rgb, hw_evt = H * W, H_evt * W_evt
    n_evt_rays = cfg.sampling_event_rays
    n_rgb_rays = cfg.sampling_rgb_rays // cfg.num_interpolated_pose
    n_poses = cfg.num_interpolated_pose

    if mesh is not None:
        import math as _math

        n_dev = mesh.devices.size
        if (2 * n_evt_rays) % n_dev:
            need = n_dev // _math.gcd(2, n_dev)
            raise ValueError(
                f"sampling_event_rays={n_evt_rays} gives {2 * n_evt_rays} "
                f"event-render rays, not divisible by the {n_dev}-device "
                f"mesh — choose a multiple of {need}"
            )

    if shard is None:

        def shard(x):
            return x

    def rand_subset(key, n, k):
        """k distinct pixel indices out of n.

        fast path: top-k of iid uniform keys via the TPU-optimized
        approx_max_k — a stratified-flavor random subset (each index's
        marginal inclusion ~ k/n; the bin structure adds slight spatial
        stratification, if anything improving ray coverage) at a fraction
        of the cost of the reference-equivalent full permutation
        (torch.randperm, model/nerf.py:214 — a 240k-element sort per
        sensor per iteration at production resolutions).
        """
        if cfg.fast_ray_sampling:
            _, idx = jax.lax.approx_max_k(jax.random.uniform(key, (n,)), k)
            return idx
        return jax.random.permutation(key, n)[:k]

    def draw_fn(keys):
        draws = {}
        if cfg.event_time_window:
            low_t, up_t = events_mod.sample_time_window(
                keys["window"], cfg.accumulate_time_length,
                cfg.random_sampling_window,
            )
            draws["low_t"], draws["up_t"] = low_t, up_t
        else:
            draws["window_key"] = keys["window"]
        draws["ray_idx_evt"] = shard(
            rand_subset(keys["ray_evt"], hw_evt, n_evt_rays)
        )
        draws["ray_idx_rgb"] = shard(
            rand_subset(keys["ray_rgb"], hw_rgb, n_rgb_rays)
        )
        draws["keys_evt"] = {
            "z": keys["z_evt"], "pdf": keys["pdf_evt"],
            "noise_c": keys["noise_evt_c"], "noise_f": keys["noise_evt_f"],
        }
        draws["keys_rgb"] = {
            "z": keys["z_rgb"], "pdf": keys["pdf_rgb"],
            "noise_c": keys["noise_rgb_c"], "noise_f": keys["noise_rgb_f"],
        }
        return draws

    def loss_fn(params, batch: SceneBatch, draws, step):
        # 1. event window + ETA (model/nerf.py:160-205)
        if cfg.event_time_window:
            low_t, up_t = draws["low_t"], draws["up_t"]
            eta, eta_overflow = events_mod.eta_time_window(
                batch.events, hw_evt, low_t, up_t,
                cap=cfg.event_window_cap,
            )
        else:
            eta, low_t, up_t = events_mod.eta_count_window(
                batch.events, hw_evt, draws["window_key"],
                cfg.accumulate_time_length, cfg.random_sampling_window,
            )
            eta_overflow = jnp.asarray(0, jnp.int32)

        # 2. spline poses (model/optimize.py:58-111)
        knots = params["knots"]
        evt_poses = spline_mod.interpolate_poses(knots, low_t, up_t, 2, cfg.traj)
        rgb_knots = knots + params["transform"][None, :]
        rgb_poses = spline_mod.interpolate_poses(
            rgb_knots, batch.rgb_exp_ts[0], batch.rgb_exp_ts[1],
            n_poses, cfg.traj,
        )

        # 3. ray subsets (randperm equivalent, model/nerf.py:214,224)
        ray_idx_evt = draws["ray_idx_evt"]
        ray_idx_rgb = draws["ray_idx_rgb"]

        # 4. renders (event: 2 poses, rgb: n_poses) — both families through
        # ONE joint coarse+fine pass: 2 fused-MLP calls/step instead of 4
        # (PROFILE_r04.md cross-call fusion; per-ray numerics unchanged)
        ret_evt, ret_rgb = renderer_mod.render_pose_families_with_ray_idx(
            params["nerf"], params["nerf_fine"],
            [
                dict(poses=evt_poses, ray_idx=ray_idx_evt, K=batch.K_evt,
                     H=H_evt, W=W_evt, keys=draws["keys_evt"],
                     remap=batch.evt_remap),
                dict(poses=rgb_poses, ray_idx=ray_idx_rgb, K=batch.K_rgb,
                     H=H, W=W, keys=draws["keys_rgb"],
                     remap=batch.img_remap),
            ],
            settings, step=step, mesh=mesh,
        )

        metrics = {}
        total = jnp.asarray(0.0)

        # 5. event loss on window endpoints (train.py:166-296)
        if cfg.event_loss:
            fine = ret_evt["rgb_map"]
            coarse = ret_evt["rgb0"]
            b1_f, b2_f = fine[:n_evt_rays], fine[n_evt_rays:]
            b1_c, b2_c = coarse[:n_evt_rays], coarse[n_evt_rays:]
            if cfg.optimize_event_crf:  # train.py:180-188
                b1_f = _apply_crf(params["event_crf"], b1_f)
                b2_f = _apply_crf(params["event_crf"], b2_f)
                b1_c = _apply_crf(params["event_crf"], b1_c)
                b2_c = _apply_crf(params["event_crf"], b2_c)
            eta_target = eta[ray_idx_evt][:, None]
            kw = dict(
                dataset=cfg.dataset, channels=cfg.channels,
                event_threshold=cfg.event_threshold,
                coeff_syn=cfg.event_coeff_syn, coeff_real=cfg.event_coeff_real,
            )
            ev_fine = loss_mod.event_loss_term(b1_f, b2_f, eta_target, **kw)
            ev_coarse = loss_mod.event_loss_term(b1_c, b2_c, eta_target, **kw)
            metrics["event_loss_fine"] = ev_fine
            metrics["event_loss_coarse"] = ev_coarse
            metrics["event_loss"] = ev_fine + ev_coarse
            total = total + ev_fine + ev_coarse

        # 6. blur-synthesis rgb loss (train.py:298-331)
        if cfg.rgb_loss:
            rgb_fine = ret_rgb["rgb_map"]
            rgb_coarse = ret_rgb["rgb0"]
            if cfg.optimize_rgb_crf:  # train.py:189-192
                rgb_fine = _apply_crf(params["rgb_crf"], rgb_fine)
                rgb_coarse = _apply_crf(params["rgb_crf"], rgb_coarse)
            target = batch.image_flat[ray_idx_rgb]
            rgb_fine_l = loss_mod.blur_rgb_loss_term(rgb_fine, target, cfg.rgb_coeff)
            rgb_coarse_l = loss_mod.blur_rgb_loss_term(
                rgb_coarse, target, cfg.rgb_coeff
            )
            metrics["rgb_loss_fine"] = rgb_fine_l
            metrics["rgb_loss_coarse"] = rgb_coarse_l
            metrics["rgb_loss"] = rgb_fine_l + rgb_coarse_l
            total = total + rgb_fine_l + rgb_coarse_l

        metrics["eta_window_overflow"] = eta_overflow
        metrics["loss"] = total
        return total, metrics

    return loss_fn, draw_fn


def _make_step_body(cfg, H: int, W: int, mesh=None, tx=None):
    tx = tx or optim_mod.build_optimizer(cfg)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ray_sharding = NamedSharding(mesh, P("data"))

        def shard(x):
            return jax.lax.with_sharding_constraint(x, ray_sharding)
    else:
        shard = None

    loss_fn, draw_fn = make_loss_fn(cfg, H, W, shard=shard, mesh=mesh)

    def body(state: TrainState, batch: SceneBatch, root_key):
        keys = rng_mod.step_keys(root_key, state.step)
        draws = draw_fn(keys)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, draws, state.step
        )
        # joint-recovery observability: how hard each collection is being
        # pushed. The knot norm is the leading indicator of whether the
        # trajectory is receiving usable signal (VERDICT r3: pose recovery
        # failed with no committed gradient evidence).
        metrics["grad_norm_knots"] = jnp.linalg.norm(grads["knots"])
        metrics["grad_norm_nerf"] = optax.global_norm(
            {"c": grads["nerf"], "f": grads["nerf_fine"]}
        )
        if getattr(cfg, "log_knot_grad_terms", False):
            # per-loss-term knot gradients (extra backward passes; diagnostics
            # only): which loss is actually steering the spline?
            def term(params_knots, name):
                p = dict(state.params)
                p["knots"] = params_knots
                _, m = loss_fn(p, batch, draws, state.step)
                return m[name]

            if cfg.event_loss:
                metrics["knot_grad_event"] = jnp.linalg.norm(
                    jax.grad(term)(state.params["knots"], "event_loss")
                )
            if cfg.rgb_loss:
                metrics["knot_grad_rgb"] = jnp.linalg.norm(
                    jax.grad(term)(state.params["knots"], "rgb_loss")
                )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return body
