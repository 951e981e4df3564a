"""Float64 exact-math parity check vs the torch reference (subprocess child).

Run by tests/test_golden_grad.py::test_loss_and_grad_parity_float64 in its
own interpreter because jax_enable_x64 is process-global. With every f32
rounding step removed on both sides (see gen_golden_grad.py's f64 cases), the
loss and all recorded gradients must agree to ~1e-9 relative across all three
loss regimes (safe_log synthetic, lin_log+L2-normalized real, CRF-enabled) —
proving the two frameworks implement the *identical* mathematical function,
and that the percent-level scatter seen in the fp32 tests is rounding, not
divergence.
"""

import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from benerf_tpu.core.config import Config
from benerf_tpu.data.events import EventArrays
from benerf_tpu.models import torch_compat
from benerf_tpu.train import step as step_mod

GOLD = pathlib.Path(__file__).parent / "golden" / "reference_golden_grad.npz"
H_RGB, W_RGB = 12, 16
H_EVT, W_EVT = 10, 14

CASES = {
    "synthetic_gray_f64": dict(dataset="BeNeRF_Blender", channels=1,
                               event_threshold=0.1, opt_crf=False),
    "real_color_f64": dict(dataset="E2NeRF_Real", channels=3,
                           event_threshold=-1.0, opt_crf=False),
    "crf_gray_f64": dict(dataset="BeNeRF_Blender", channels=1,
                         event_threshold=0.1, opt_crf=True),
}


def run_case(g, case):
    c = CASES[case]
    p = f"{case}::"
    cfg = Config(
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
        use_pallas=False, sigma_noise_std=1.0, event_window_cap=0,
    )

    def sub(prefix):
        return {k[len(prefix):]: g[k] for k in g.files if k.startswith(prefix)}

    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent / "golden"))
    import param_gen

    params = {
        "nerf": torch_compat.nerf_params_from_state_dict(
            param_gen.nerf_state_dict(case, "nerf", c["channels"], f64=True)
        ),
        "nerf_fine": torch_compat.nerf_params_from_state_dict(
            param_gen.nerf_state_dict(case, "nerf_fine", c["channels"],
                                      f64=True)
        ),
        "knots": jnp.asarray(g[p + "knots"], jnp.float64),
        "transform": jnp.asarray(g[p + "transform"][0], jnp.float64),
        "rgb_crf": {"layers": []},
        "event_crf": {"layers": []},
    }
    if c["opt_crf"]:
        params["rgb_crf"] = torch_compat.crf_params_from_state_dict(
            sub(p + "rgb_crf::")
        )
        params["event_crf"] = torch_compat.crf_params_from_state_dict(
            sub(p + "event_crf::")
        )
    assert params["nerf"]["pts"][0]["w"].dtype == jnp.float64

    events = EventArrays(
        pix_idx=jnp.asarray(
            g[p + "evt_y"].astype(np.int64) * W_EVT + g[p + "evt_x"],
            jnp.int32,
        ),
        ts=jnp.asarray(g[p + "evt_ts"], jnp.float64),
        pol=jnp.asarray(g[p + "evt_pol"], jnp.float64),
    )
    batch = step_mod.SceneBatch(
        events=events,
        image_flat=jnp.asarray(
            g[p + "img"][0].reshape(-1, cfg.channels), jnp.float64
        ),
        rgb_exp_ts=jnp.asarray(g[p + "rgb_exp_ts"], jnp.float64),
        K_rgb=jnp.asarray(g[p + "K_rgb"], jnp.float64),
        K_evt=jnp.asarray(g[p + "K_evt"], jnp.float64),
    )
    f64 = lambda k: jnp.asarray(g[p + k], jnp.float64)
    draws = {
        "low_t": f64("low_t"),
        "up_t": f64("up_t"),
        "ray_idx_evt": jnp.asarray(g[p + "ray_idx_evt"]),
        "ray_idx_rgb": jnp.asarray(g[p + "ray_idx_rgb"]),
        "keys_evt": {
            "z_u": f64("z_u_evt"), "pdf_u": f64("pdf_u_evt"),
            "noise_c_vals": f64("noise_c_evt"),
            "noise_f_vals": f64("noise_f_evt"),
        },
        "keys_rgb": {
            "z_u": f64("z_u_rgb"), "pdf_u": f64("pdf_u_rgb"),
            "noise_c_vals": f64("noise_c_rgb"),
            "noise_f_vals": f64("noise_f_rgb"),
        },
    }

    loss_fn, _ = step_mod.make_loss_fn(cfg, H_RGB, W_RGB)
    (total, metrics), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params, batch, draws, jnp.asarray(0, jnp.int32))
    assert jnp.asarray(total).dtype == jnp.float64

    def close(actual, desired, name, rtol=1e-9):
        actual, desired = np.asarray(actual), np.asarray(desired)
        atol = rtol * max(np.abs(desired).max(), 1e-300)
        np.testing.assert_allclose(actual, desired, rtol=rtol, atol=atol,
                                   err_msg=f"{case}: {name}")

    for key in ("event_loss_fine", "event_loss_coarse",
                "rgb_loss_fine", "rgb_loss_coarse"):
        close(float(metrics[key]), g[p + key], key, rtol=1e-11)
    close(float(total), g[p + "loss"], "loss", rtol=1e-11)
    close(grads["knots"], g[p + "grad_knots"], "knots")
    close(grads["transform"], g[p + "grad_transform"][0], "transform")
    for tag in ("nerf", "nerf_fine"):
        close(grads[tag]["pts"][0]["w"], g[f"{p}grad_{tag}_l0_w"].T,
              f"{tag} l0 w")
        close(grads[tag]["pts"][0]["b"], g[f"{p}grad_{tag}_l0_b"],
              f"{tag} l0 b")
        close(grads[tag]["rgb"]["w"], g[f"{p}grad_{tag}_rgb_w"].T,
              f"{tag} rgb w")
        close(grads[tag]["alpha"]["b"], g[f"{p}grad_{tag}_alpha_b"],
              f"{tag} alpha b")
    if c["opt_crf"]:
        for crf in ("rgb_crf", "event_crf"):
            want = torch_compat.crf_params_from_state_dict(
                sub(f"{p}grad_{crf}::")
            )
            for i, layer in enumerate(want["layers"]):
                close(grads[crf]["layers"][i]["w"], layer["w"],
                      f"{crf} l{i} w")
                close(grads[crf]["layers"][i]["b"], layer["b"],
                      f"{crf} l{i} b")
    print(f"  {case}: ok")


def main():
    g = np.load(GOLD)
    for case in CASES:
        if f"{case}::loss" not in g.files:
            raise SystemExit(f"{case} fixtures missing; rerun gen_golden_grad")
        run_case(g, case)
    print("x64 parity OK: loss and gradients match the torch reference "
          "to <=1e-9 relative in all three loss regimes")


if __name__ == "__main__":
    main()
