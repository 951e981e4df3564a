"""Integration tests: synthetic scene end-to-end training, checkpoint
round-trip, optimizer gating, config parsing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benerf_tpu.core.config import Config, load_config, parse_config_text
from benerf_tpu.data import datasets, synthetic
from benerf_tpu.train import checkpoint as ckpt_mod
from benerf_tpu.train import optim as optim_mod
from benerf_tpu.train import step as step_mod


def tiny_cfg(datadir, **overrides):
    kw = dict(
        dataset="BeNeRF_Blender", datadir=datadir, index=0, channels=3,
        event_width=40, event_height=40,
        rgb_fx=50.0, rgb_fy=50.0, rgb_cx=20.0, rgb_cy=20.0,
        event_fx=50.0, event_fy=50.0, event_cx=20.0, event_cy=20.0,
        N_samples=8, N_importance=8,
        sampling_event_rays=64, sampling_rgb_rays=60, num_interpolated_pose=5,
        use_viewdirs=True, event_time_window=True, random_sampling_window=True,
        event_loss=True, rgb_loss=True, event_threshold=0.1,
        event_coeff_syn=0.1,
        optimize_nerf=True, optimize_pose=True, use_pallas=False,
        max_iter=100, event_shift_start=0, event_shift_end=0,
        lrate=5e-4, pose_lrate=5e-4,
    )
    kw.update(overrides)
    return Config(**kw)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    synthetic.write_benerf_blender_scene(
        str(d), H=40, W=40, focal=50.0, n_virtual=7, n_images=1
    )
    return str(d)


@pytest.fixture(scope="module")
def loaded(scene_dir):
    cfg = tiny_cfg(scene_dir)
    scene = datasets.load_scene(scene_dir, cfg)
    return cfg, scene


def _batch(cfg, scene):
    from benerf_tpu.train.loop import intrinsics, make_batch

    K_rgb, K_evt, *_ = intrinsics(cfg)
    return make_batch(scene, cfg, K_rgb, K_evt)


def test_loader_shapes(loaded):
    cfg, scene = loaded
    assert scene.image.shape == (1, 40, 40, 3)
    assert scene.imgtest.shape == (1, 40, 40, 3)
    assert scene.events.num > 100
    assert np.all(np.diff(np.asarray(scene.events.ts)) >= 0)
    assert 0.0 <= float(scene.rgb_exp_ts[0]) < float(scene.rgb_exp_ts[1]) <= 1.0


def test_training_decreases_loss(loaded):
    cfg, scene = loaded
    batch = _batch(cfg, scene)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    fn = step_mod.make_train_step(cfg, H, W)
    key = jax.random.PRNGKey(1)
    state, m0 = fn(state, batch, key)
    first = float(m0["loss"])
    for _ in range(40):
        state, m = fn(state, batch, key)
    assert float(m["loss"]) < 0.5 * first
    assert np.isfinite(float(m["loss"]))


def test_pose_knots_receive_updates(loaded):
    cfg, scene = loaded
    batch = _batch(cfg, scene)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    knots0 = np.asarray(state.params["knots"]).copy()
    fn = step_mod.make_train_step(cfg, H, W)
    state, _ = fn(state, batch, jax.random.PRNGKey(1))
    assert not np.allclose(knots0, np.asarray(state.params["knots"]))
    # disabled groups must NOT move (transform/crf are off by default)
    assert np.allclose(np.asarray(state.params["transform"]), 0.0)


def test_optimizer_gating(loaded):
    cfg, scene = loaded
    cfg2 = tiny_cfg(cfg.datadir, optimize_pose=False)
    batch = _batch(cfg2, scene)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg2, jax.random.PRNGKey(0))
    knots0 = np.asarray(state.params["knots"]).copy()
    fn = step_mod.make_train_step(cfg2, H, W)
    state, _ = fn(state, batch, jax.random.PRNGKey(1))
    assert np.allclose(knots0, np.asarray(state.params["knots"]))


def test_checkpoint_roundtrip(loaded, tmp_path):
    cfg, scene = loaded
    batch = _batch(cfg, scene)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    fn = step_mod.make_train_step(cfg, H, W)
    for _ in range(3):
        state, _ = fn(state, batch, jax.random.PRNGKey(1))

    path = ckpt_mod.save(str(tmp_path), state)
    assert os.path.exists(path)
    template = step_mod.init_state(cfg, jax.random.PRNGKey(7))
    restored = ckpt_mod.restore(str(tmp_path), template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert np.allclose(np.asarray(a), np.asarray(b))

    # resumed training continues identically
    s1, m1 = fn(state, batch, jax.random.PRNGKey(2))
    s2, m2 = fn(restored, batch, jax.random.PRNGKey(2))
    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_count_window_mode_trains(loaded):
    cfg, scene = loaded
    cfg2 = tiny_cfg(cfg.datadir, event_time_window=False,
                    accumulate_time_length=0.2)
    batch = _batch(cfg2, scene)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg2, jax.random.PRNGKey(0))
    fn = step_mod.make_train_step(cfg2, H, W)
    state, m = fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_linear_traj_mode_trains(loaded):
    cfg, scene = loaded
    cfg2 = tiny_cfg(cfg.datadir, traj="linear")
    batch = _batch(cfg2, scene)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg2, jax.random.PRNGKey(0))
    fn = step_mod.make_train_step(cfg2, H, W)
    state, m = fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_crf_optimization_path(loaded):
    cfg, scene = loaded
    cfg2 = tiny_cfg(cfg.datadir, optimize_event_crf=True, optimize_rgb_crf=True,
                    channels=3)
    batch = _batch(cfg2, scene)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg2, jax.random.PRNGKey(0))
    crf0 = np.asarray(state.params["event_crf"]["layers"][0]["w"]).copy()
    fn = step_mod.make_train_step(cfg2, H, W)
    state, m = fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(crf0,
                           np.asarray(state.params["event_crf"]["layers"][0]["w"]))


def test_reference_config_parses():
    ref = "/root/reference/configs/benerf_blender/tanabata.txt"
    if not os.path.exists(ref):
        pytest.skip("reference configs unavailable")
    cfg = load_config(ref)
    assert cfg.dataset == "BeNeRF_Blender"
    assert cfg.N_samples == 64 and cfg.N_importance == 64
    assert cfg.sampling_event_rays == 1024
    assert cfg.event_threshold == 0.1
    assert cfg.num_interpolated_pose == 19
    assert cfg.optimize_nerf and cfg.optimize_pose and not cfg.optimize_trans
    assert cfg.rgb_dist == [0.0, 0.0, 0.0, 0.0]
    assert cfg.max_iter == 80000
    assert cfg.traj == "spline"


def test_config_text_parsing_types():
    text = """
    ## comment
    channels = 1
    lrate = 5e-4
    optimize_nerf = True
    rgb_dist = [0, 0, 0, 0]
    dataset = E2NeRF_Real
    unknown_key = whatever
    """
    vals = parse_config_text(text)
    assert vals["channels"] == 1
    assert vals["lrate"] == 5e-4
    assert vals["optimize_nerf"] is True
    assert vals["rgb_dist"] == [0.0, 0.0, 0.0, 0.0]
    assert vals["dataset"] == "E2NeRF_Real"
    assert "unknown_key" not in vals


def test_pose_lrate_warmup_schedule():
    """pose_lrate_warmup ramps the knot updates from ~0 while leaving the
    NeRF group and the default (warmup=0) behavior untouched."""
    import optax

    cfg_w = tiny_cfg("unused", pose_lrate_warmup=100)
    cfg_0 = tiny_cfg("unused")
    params = step_mod.build_params(cfg_0, jax.random.PRNGKey(0))
    grads = jax.tree.map(jnp.ones_like, params)

    def first_update(cfg):
        tx = optim_mod.build_optimizer(cfg)
        upd, _ = tx.update(grads, tx.init(params), params)
        return upd

    u_w = first_update(cfg_w)
    u_0 = first_update(cfg_0)
    # step 0 of a 100-step linear warmup: knot lr == 0
    assert float(jnp.abs(u_w["knots"]).max()) == 0.0
    assert float(jnp.abs(u_0["knots"]).max()) > 1e-6
    # the NeRF group is unaffected by pose warmup
    nerf_w = jax.tree.leaves(u_w["nerf"])[0]
    nerf_0 = jax.tree.leaves(u_0["nerf"])[0]
    np.testing.assert_allclose(np.asarray(nerf_w), np.asarray(nerf_0))

    # halfway through warmup the knot lr is ~half the nominal lr
    tx = optim_mod.build_optimizer(cfg_w)
    st = tx.init(params)
    upd = None
    for _ in range(50):
        upd, st = tx.update(grads, st, params)
    tx0 = optim_mod.build_optimizer(cfg_0)
    st0 = tx0.init(params)
    upd0 = None
    for _ in range(50):
        upd0, st0 = tx0.update(grads, st0, params)
    ratio = float(jnp.abs(upd["knots"]).max() / jnp.abs(upd0["knots"]).max())
    assert 0.3 < ratio < 0.7


def test_quality_harness_run_isolation(tmp_path):
    """Two quality runs in the same workdir must not contaminate each other:
    each gets a fresh run-NNN logdir and harvests only its own checkpoints
    (round-3 integrity bug: JsonlLogger appends, quality.py read it all)."""
    from benerf_tpu.eval import quality

    kw = dict(
        iters=2, evals=1, H=24, W=24, seed=0,
        sampling_event_rays=16, sampling_rgb_rays=15,
        num_interpolated_pose=3, N_samples=8, N_importance=8,
        use_pallas=False, console_log_iter=1,
    )
    a1 = quality.run_quality(str(tmp_path), **kw)
    a2 = quality.run_quality(str(tmp_path), **kw)
    assert a1["run_dir"] != a2["run_dir"]
    # each artifact harvests exactly its own eval records (1 eval per run)
    assert len(a1["checkpoints"]) == 1
    assert len(a2["checkpoints"]) == 1
    assert a1["wall_s"] > 0 and a1["platform"]
    assert a1["scene"]["generator"]["scene_format_version"] >= 2


def test_grad_norm_metrics(loaded):
    """Per-collection grad norms and per-loss-term knot grads are logged."""
    cfg, scene = loaded
    cfg2 = tiny_cfg(cfg.datadir, log_knot_grad_terms=True)
    batch = _batch(cfg2, scene)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg2, jax.random.PRNGKey(0))
    fn = step_mod.make_train_step(cfg2, H, W)
    _, m = fn(state, batch, jax.random.PRNGKey(1))
    for k in ("grad_norm_knots", "grad_norm_nerf",
              "knot_grad_event", "knot_grad_rgb"):
        assert np.isfinite(float(m[k])), k
    assert float(m["grad_norm_nerf"]) > 0


@pytest.mark.slow
def test_pose_recovery_regression(tmp_path):
    """Joint-recovery regression gate (VERDICT r2 task 1 / r3 task 6).

    ANALYSIS_pose_recovery.md: from reference-style near-zero init, neither
    this framework nor the torch reference escapes the NeRF-absorption
    minimum at small iteration counts — but the GT basin is a strong
    attractor (>=30% perturbation). This test pins that attractor: from a
    30%-perturbed GT init the optimizer must pull the trajectory flow error
    DOWN materially (not merely the loss), so a change that breaks pose
    gradients (spline VJP, ray-gen chain, event-loss wiring, optimizer
    grouping) fails it even though rendering losses still decrease.
    """
    from benerf_tpu.eval import quality

    art = quality.run_quality(
        str(tmp_path), iters=220, evals=2, H=32, W=32, seed=0,
        init_from_gt=0.35, target_blur_px=6.0,
        sampling_event_rays=128, sampling_rgb_rays=95,
        num_interpolated_pose=5, N_samples=16, N_importance=16,
        use_pallas=False, console_log_iter=110,
    )
    first = art["checkpoints"][0]["pose_flow_rmse_px"]
    final = art["checkpoints"][-1]["pose_flow_rmse_px"]
    gt_motion = art["baseline"]["gt_flow_rms_px"]
    # 220 CPU iters are inside the attractor's wobble band (measured:
    # 0.35 -> 0.38 px vs 2.0 px motion), so the gate is that the optimizer
    # HOLDS the trajectory: a broken pose-gradient path (spline VJP sign,
    # ray-gen chain, optimizer grouping) random-walks the spline toward the
    # do-nothing level (~gt_motion; random init measures ~2.0 px here)
    # within these iterations, while a healthy one stays well below it.
    assert final < 0.25 * gt_motion, (
        f"pose flow blew up: {first:.3f} -> {final:.3f} "
        f"(gt motion {gt_motion:.3f})"
    )
    assert np.isfinite(final)


def test_motion_scale_pose_init(scene_dir):
    """Data-driven init (train/pose_init.py): the apparent-motion estimate
    lands within a small factor of the generator's calibrated blur, and the
    knots are deterministic per seed with the configured shape/scale."""
    from benerf_tpu.train import pose_init

    cfg = tiny_cfg(scene_dir, pose_init="motion_scale")
    scene = datasets.load_scene(scene_dir, cfg)
    knots, d_px = pose_init.initial_knots(cfg, scene)
    knots2, d2 = pose_init.initial_knots(cfg, scene)
    assert knots.shape == (4, 6)
    np.testing.assert_array_equal(knots, knots2)
    assert d_px == d2
    # the 40x40 fixture scene is written with target_blur_px=6; the
    # estimator is biased low (sub-threshold pixels fire no events) but
    # must land within a factor ~3 — the GT basin tolerates >2x scale error
    # (DIAG_r04 variant J)
    assert 6.0 / 3 < d_px < 6.0 * 3, d_px
    # rotation-dominant layout
    assert np.abs(knots[:, :3]).mean() > np.abs(knots[:, 3:]).mean()


@pytest.mark.slow
def test_motion_scale_recovery_gate(tmp_path):
    """CI gate for the SHIPPED recipe (VERDICT r4 weak #1): motion-scale
    init from the data alone (no GT) must leave the trajectory materially
    below the do-nothing flow level and keep it there while deblurring
    proceeds. Calibration (2026-08, 32x32/600 iters): flow holds at
    ~1.11 px vs gt motion 2.00 px, PSNR 28->36 dB. A broken
    estimate_motion_px (e.g. returning 0 -> near-zero init) parks flow at
    ~gt motion and fails the 0.65 bound; a broken optimizer/spline path
    random-walks it upward."""
    from benerf_tpu.eval import quality

    art = quality.run_quality(
        str(tmp_path), iters=400, evals=2, H=32, W=32, seed=0,
        pose_init="motion_scale", target_blur_px=6.0,
        sampling_event_rays=128, sampling_rgb_rays=95,
        num_interpolated_pose=5, N_samples=16, N_importance=16,
        use_pallas=False, console_log_iter=200,
    )
    final = art["checkpoints"][-1]
    first = art["checkpoints"][0]
    gt_motion = art["baseline"]["gt_flow_rms_px"]
    assert final["pose_flow_rmse_px"] < 0.65 * gt_motion, (
        final, gt_motion)
    # deblurring must actually progress under the recipe. NOT gated on
    # beating the blurry input: at 32x32 the downsampled input is ~35 dB
    # and beating it needs ~600 CPU iters with <1 dB margin (measured) —
    # a flaky absolute bar; the 8k-iter TPU artifacts gate that instead.
    assert final["test_mid_psnr"] > first["test_mid_psnr"] + 3.0, (
        first["test_mid_psnr"], final["test_mid_psnr"])
