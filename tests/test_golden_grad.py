"""END-TO-END loss + GRADIENT parity vs the PyTorch reference.

The north-star check (BASELINE.json): loss values and d loss / d {spline
knots, event->rgb transform, MLP weights, CRF weights} must match the
reference's autograd (train.py:339-340 backprop through spline.py:247-303)
at fp32 tolerances. Fixtures are recorded by tests/golden/gen_golden_grad.py:
every stochastic draw of one reference training iteration is captured as
data and injected here through make_loss_fn's `draws` dict, so both
frameworks evaluate the *same* mathematical function.

Runs the production loss path twice: pure-jnp and the Pallas kernel in
interpreter mode (same custom VJP that runs on TPU).
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent / "golden"))
import param_gen  # noqa: E402  (shared NeRF weight synthesis, see its doc)

from benerf_tpu.core.config import Config
from benerf_tpu.data import events as events_mod
from benerf_tpu.models import torch_compat
from benerf_tpu.ops import mlp as mlp_ops
from benerf_tpu.train import step as step_mod

GOLD_PATH = pathlib.Path(__file__).parent / "golden" / "reference_golden_grad.npz"

H_RGB, W_RGB = 12, 16
H_EVT, W_EVT = 10, 14

CASES = {
    # grad_rel / grad_frac: per-case fp32 tolerance envelopes, ~2.5-6x above
    # the measured worst (2026-08, jnp + pallas-interpret, param_gen weights):
    #   synthetic_gray  rel 1.5e-3, frac 0.0000
    #   real_color      rel 1.8e-2 (knots; the L2-normalized event loss
    #                   amplifies rounding), frac 0.0042
    #   crf_gray        rel 2.7e-2 (sigmoid CRFs amplify ReLU-boundary
    #                   flips),  frac 0.0153
    # Only the amplified cases get wide bounds (ADVICE r4 #2); a real
    # divergence in the plain path cannot hide inside CRF-sized slack.
    "synthetic_gray": dict(dataset="BeNeRF_Blender", channels=1,
                           event_threshold=0.1, opt_crf=False,
                           grad_rel=1e-2, grad_frac=0.005),
    "real_color": dict(dataset="E2NeRF_Real", channels=3,
                       event_threshold=-1.0, opt_crf=False,
                       grad_rel=4.5e-2, grad_frac=0.015),
    "crf_gray": dict(dataset="BeNeRF_Blender", channels=1,
                     event_threshold=0.1, opt_crf=True,
                     grad_rel=7e-2, grad_frac=0.04),
}


@pytest.fixture(scope="module")
def gold():
    if not GOLD_PATH.exists():
        pytest.skip("run tests/golden/gen_golden_grad.py first")
    return np.load(GOLD_PATH)


def build_cfg(case, use_pallas=False):
    c = CASES[case]
    return Config(
        dataset=c["dataset"], datadir="/nonexistent", index=0,
        channels=c["channels"],
        event_width=W_EVT, event_height=H_EVT,
        N_samples=8, N_importance=8,
        sampling_event_rays=16, sampling_rgb_rays=9, num_interpolated_pose=3,
        accumulate_time_length=0.3,
        use_viewdirs=True, ndc=True, traj="spline",
        event_time_window=True, random_sampling_window=True,
        event_loss=True, rgb_loss=True,
        event_threshold=c["event_threshold"],
        event_coeff_syn=0.1, event_coeff_real=2.0, rgb_coeff=1.0,
        optimize_event_crf=c["opt_crf"], optimize_rgb_crf=c["opt_crf"],
        rgb_crf_net_hidden=0, rgb_crf_net_width=32,
        event_crf_net_hidden=0, event_crf_net_width=32,
        use_pallas=use_pallas, sigma_noise_std=1.0, event_window_cap=0,
    )


def sub_state_dict(g, prefix):
    return {k[len(prefix):]: g[k] for k in g.files if k.startswith(prefix)}


def build_inputs(g, case, cfg):
    p = f"{case}::"
    params = step_mod.build_params(cfg, jax.random.PRNGKey(0))
    params["nerf"] = torch_compat.nerf_params_from_state_dict(
        param_gen.nerf_state_dict(case, "nerf", cfg.channels)
    )
    params["nerf_fine"] = torch_compat.nerf_params_from_state_dict(
        param_gen.nerf_state_dict(case, "nerf_fine", cfg.channels)
    )
    params["knots"] = jnp.asarray(g[p + "knots"])
    params["transform"] = jnp.asarray(g[p + "transform"][0])
    if CASES[case]["opt_crf"]:
        params["rgb_crf"] = torch_compat.crf_params_from_state_dict(
            sub_state_dict(g, p + "rgb_crf::")
        )
        params["event_crf"] = torch_compat.crf_params_from_state_dict(
            sub_state_dict(g, p + "event_crf::")
        )

    events = events_mod.prepare(
        g[p + "evt_x"], g[p + "evt_y"], g[p + "evt_ts"], g[p + "evt_pol"],
        width=W_EVT,
    )
    batch = step_mod.SceneBatch(
        events=events,
        image_flat=jnp.asarray(g[p + "img"][0].reshape(-1, cfg.channels)),
        rgb_exp_ts=jnp.asarray(g[p + "rgb_exp_ts"]),
        K_rgb=jnp.asarray(g[p + "K_rgb"]),
        K_evt=jnp.asarray(g[p + "K_evt"]),
    )
    draws = {
        "low_t": jnp.asarray(g[p + "low_t"]),
        "up_t": jnp.asarray(g[p + "up_t"]),
        "ray_idx_evt": jnp.asarray(g[p + "ray_idx_evt"]),
        "ray_idx_rgb": jnp.asarray(g[p + "ray_idx_rgb"]),
        "keys_evt": {
            "z_u": jnp.asarray(g[p + "z_u_evt"]),
            "pdf_u": jnp.asarray(g[p + "pdf_u_evt"]),
            "noise_c_vals": jnp.asarray(g[p + "noise_c_evt"]),
            "noise_f_vals": jnp.asarray(g[p + "noise_f_evt"]),
        },
        "keys_rgb": {
            "z_u": jnp.asarray(g[p + "z_u_rgb"]),
            "pdf_u": jnp.asarray(g[p + "pdf_u_rgb"]),
            "noise_c_vals": jnp.asarray(g[p + "noise_c_rgb"]),
            "noise_f_vals": jnp.asarray(g[p + "noise_f_rgb"]),
        },
    }
    return params, batch, draws


def run_loss_and_grads(case, gold, use_pallas):
    cfg = build_cfg(case, use_pallas=use_pallas)
    params, batch, draws = build_inputs(gold, case, cfg)
    loss_fn, _ = step_mod.make_loss_fn(cfg, H_RGB, W_RGB)
    if use_pallas:
        mlp_ops.force_interpret(True)
    try:
        (total, metrics), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params, batch, draws, jnp.asarray(0, jnp.int32))
    finally:
        if use_pallas:
            mlp_ops.force_interpret(False)
    return total, metrics, grads


def check_case(case, gold, use_pallas, grad_rtol):
    p = f"{case}::"
    g = gold
    total, metrics, grads = run_loss_and_grads(case, gold, use_pallas)

    # eta cross-check: the scatter targets must be identical (exact ±1 sums)
    eta, _ = events_mod.eta_time_window(
        events_mod.prepare(g[p + "evt_x"], g[p + "evt_y"], g[p + "evt_ts"],
                           g[p + "evt_pol"], width=W_EVT),
        H_EVT * W_EVT, jnp.asarray(g[p + "low_t"]), jnp.asarray(g[p + "up_t"]),
    )
    np.testing.assert_array_equal(
        np.asarray(eta).reshape(H_EVT, W_EVT), g[p + "eta"]
    )

    # loss terms
    np.testing.assert_allclose(
        float(metrics["event_loss_fine"]), g[p + "event_loss_fine"],
        rtol=1e-4, err_msg="event_loss_fine",
    )
    np.testing.assert_allclose(
        float(metrics["event_loss_coarse"]), g[p + "event_loss_coarse"],
        rtol=1e-4, err_msg="event_loss_coarse",
    )
    np.testing.assert_allclose(
        float(metrics["rgb_loss_fine"]), g[p + "rgb_loss_fine"],
        rtol=1e-4, err_msg="rgb_loss_fine",
    )
    np.testing.assert_allclose(
        float(metrics["rgb_loss_coarse"]), g[p + "rgb_loss_coarse"],
        rtol=1e-4, err_msg="rgb_loss_coarse",
    )
    np.testing.assert_allclose(float(total), g[p + "loss"], rtol=1e-4)

    def close(actual, desired, name):
        """fp32 gradient comparison. The x64 test proves the math identical
        to 1e-9; at fp32 the two (mathematically equal) op orderings differ
        by rounding amplified through depth + ReLU boundary flips, so we
        check aggregate closeness (relative RMS) plus an elementwise bound
        that nearly all entries must satisfy."""
        a = np.asarray(actual, np.float64)
        d = np.asarray(desired, np.float64)
        rms = lambda x: float(np.sqrt((x ** 2).mean()))
        rel = rms(a - d) / max(rms(d), 1e-30)
        # per-case measured envelopes: see CASES (the x64 subprocess test
        # pins the math itself at <=1e-9; test_pallas pins kernel==jnp)
        rel_bound = CASES[case]["grad_rel"]
        frac_bound = CASES[case]["grad_frac"]
        assert rel < rel_bound, (
            f"{name}: rel_rms {rel:.2e} (case bound {rel_bound:.1e})"
        )
        tol = grad_rtol * np.abs(d) + 8e-2 * max(rms(d), 1e-30)
        frac = float((np.abs(a - d) > tol).mean())
        assert frac < frac_bound, (
            f"{name}: {frac:.3%} elements out of tolerance "
            f"(case bound {frac_bound:.3%})"
        )

    # gradients: trajectory (through se3 exp/log + spline), then MLP layers
    close(grads["knots"], g[p + "grad_knots"], "d loss/d knots")
    close(grads["transform"], g[p + "grad_transform"][0], "d loss/d transform")
    for tag in ("nerf", "nerf_fine"):
        gp = grads[tag]
        close(gp["pts"][0]["w"], g[f"{p}grad_{tag}_l0_w"].T, f"{tag} l0 w")
        close(gp["pts"][0]["b"], g[f"{p}grad_{tag}_l0_b"], f"{tag} l0 b")
        close(gp["rgb"]["w"], g[f"{p}grad_{tag}_rgb_w"].T, f"{tag} rgb w")
        close(gp["alpha"]["b"], g[f"{p}grad_{tag}_alpha_b"], f"{tag} alpha b")
    if CASES[case]["opt_crf"]:
        for crf in ("rgb_crf", "event_crf"):
            sd = sub_state_dict(g, f"{p}grad_{crf}::")
            want = torch_compat.crf_params_from_state_dict(sd)
            for i, layer in enumerate(want["layers"]):
                close(grads[crf]["layers"][i]["w"], layer["w"],
                      f"{crf} l{i} w")
                close(grads[crf]["layers"][i]["b"], layer["b"],
                      f"{crf} l{i} b")


@pytest.mark.parametrize("case", list(CASES))
def test_loss_and_grad_parity_jnp(case, gold):
    check_case(case, gold, use_pallas=False, grad_rtol=2e-3)


@pytest.mark.parametrize("case", list(CASES))
def test_loss_and_grad_parity_pallas_interpret(case, gold):
    # the kernel's DEFAULT precision is one bf16 MXU pass; in interpret mode
    # it runs as written — tolerances cover the f32-vs-kernel difference
    check_case(case, gold, use_pallas=True, grad_rtol=2e-3)


def test_loss_and_grad_parity_float64(gold):
    """Exact-math proof: in float64 (both frameworks, f32 casts lifted) the
    loss and every recorded gradient — through se3 exp/log, the cumulative
    B-spline, ray generation, NDC, both renders, and both losses — must
    match the torch reference to <=1e-9 relative. Runs in a subprocess
    because jax_enable_x64 is process-global."""
    import subprocess
    import sys

    if f"synthetic_gray_f64::loss" not in gold.files:
        pytest.skip("f64 fixtures missing; rerun gen_golden_grad.py")
    child = pathlib.Path(__file__).parent / "x64_parity_child.py"
    res = subprocess.run(
        [sys.executable, str(child)], capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, f"stdout:{res.stdout}\nstderr:{res.stderr}"
    assert "x64 parity OK" in res.stdout
