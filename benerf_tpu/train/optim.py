"""Optimizer assembly: the reference's 5 independent Adams as ONE optax
multi_transform over labeled parameter collections.

Reference (model/optimize.py:36-55 + train.py:343-394): Adam(lr_i) per group
{nerf (coarse+fine), pose knots, rgb<->event transform, rgb CRF, event CRF},
each with its own exponential decay lr_i * rate_i^(step/(lrate_decay*1000))
applied every step, and stepped only when its optimize_* flag is set.

Here: labels map each subtree to adam(optax.exponential_decay(...)); disabled
groups get optax.set_to_zero() (their grads are computed but discarded,
exactly like torch's "backward then don't step"). One jitted update replaces
five Python-side optimizer objects. Note the reference updates lr AFTER each
step, so step i uses lr(i-1); our schedules use lr(i) — a one-step phase
shift on a 200k-step decay (relative lr difference < 1.2e-5), documented.
"""

from __future__ import annotations

import optax


GROUPS = ("nerf", "knots", "transform", "rgb_crf", "event_crf")


def param_labels(params):
    """Map the train-state param pytree to optimizer-group labels."""
    labels = {}
    for key in params:
        if key in ("nerf", "nerf_fine"):
            labels[key] = "nerf"
        elif key == "knots":
            labels[key] = "knots"
        elif key == "transform":
            labels[key] = "transform"
        elif key == "rgb_crf":
            labels[key] = "rgb_crf"
        elif key == "event_crf":
            labels[key] = "event_crf"
        else:
            raise ValueError(f"unlabeled param collection {key!r}")
    import jax

    return {
        k: jax.tree.map(lambda _: labels[k], params[k]) for k in params
    }


def _chain(enabled: bool, lr: float, decay_rate: float, decay_steps: int,
           warmup_steps: int = 0):
    if not enabled:
        return optax.set_to_zero()
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=False,
    )
    if warmup_steps > 0:
        # linear 0 -> lr ramp before the exponential decay: keeps the pose
        # from being scrambled by untrained-NeRF gradients in the first few
        # hundred iterations (off by default — the reference has no warmup).
        # Applies to BOTH the knot and transform groups (build_optimizer
        # passes pose_lrate_warmup to each).
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps), schedule],
            boundaries=[warmup_steps],
        )
    return optax.adam(learning_rate=schedule)  # betas/eps match torch defaults


def build_optimizer(cfg):
    """One optax GradientTransformation covering all five groups."""
    decay_steps = cfg.lrate_decay * 1000  # train.py:356
    transforms = {
        "nerf": _chain(cfg.optimize_nerf, cfg.lrate, cfg.decay_rate, decay_steps),
        "knots": _chain(
            cfg.optimize_pose, cfg.pose_lrate, cfg.decay_rate_pose, decay_steps,
            warmup_steps=cfg.pose_lrate_warmup,
        ),
        "transform": _chain(
            cfg.optimize_trans, cfg.transform_lrate, cfg.decay_rate_transform,
            decay_steps, warmup_steps=cfg.pose_lrate_warmup,
        ),
        "rgb_crf": _chain(
            cfg.optimize_rgb_crf, cfg.rgb_crf_lrate, cfg.decay_rate_rgb_crf,
            decay_steps,
        ),
        "event_crf": _chain(
            cfg.optimize_event_crf, cfg.event_crf_lrate, cfg.decay_rate_event_crf,
            decay_steps,
        ),
    }
    return optax.multi_transform(transforms, param_labels)
