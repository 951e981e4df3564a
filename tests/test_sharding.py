"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4.4):
the sharded step runs, and its loss/grads match the unsharded step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benerf_tpu.parallel import mesh as mesh_mod
from benerf_tpu.train import step as step_mod
from tests.test_train import tiny_cfg


@pytest.fixture(scope="module")
def cpu_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8)


def _setup(tmp_path_factory, n_evt_rays=64, n_rgb=60):
    from benerf_tpu.data import datasets, synthetic
    from benerf_tpu.train.loop import intrinsics, make_batch

    d = str(tmp_path_factory.mktemp("shard_scene"))
    synthetic.write_benerf_blender_scene(d, H=40, W=40, focal=50.0,
                                         n_virtual=5, n_images=1)
    cfg = tiny_cfg(d, sampling_event_rays=n_evt_rays, sampling_rgb_rays=n_rgb)
    scene = datasets.load_scene(d, cfg)
    K_rgb, K_evt, *_ = intrinsics(cfg)
    return cfg, scene, make_batch(scene, cfg, K_rgb, K_evt)


def test_mesh_creation(cpu_mesh):
    assert cpu_mesh.shape[mesh_mod.DATA_AXIS] == 8


def test_sharded_step_matches_unsharded(cpu_mesh, tmp_path_factory):
    cfg, scene, batch = _setup(tmp_path_factory)
    H, W = scene.image.shape[1:3]
    key = jax.random.PRNGKey(1)

    state_a = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    fn_plain = step_mod.make_train_step(cfg, H, W, mesh=None)
    out_a, m_a = fn_plain(state_a, batch, key)

    state_b = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    state_b = mesh_mod.replicate_tree(state_b, cpu_mesh)
    fn_mesh = step_mod.make_train_step(cfg, H, W, mesh=cpu_mesh)
    with cpu_mesh:
        out_b, m_b = fn_mesh(state_b, batch, key)

    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out_a.params), jax.tree.leaves(out_b.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_multiple_steps_stable(cpu_mesh, tmp_path_factory):
    cfg, scene, batch = _setup(tmp_path_factory)
    H, W = scene.image.shape[1:3]
    state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
    state = mesh_mod.replicate_tree(state, cpu_mesh)
    fn = step_mod.make_train_step(cfg, H, W, mesh=cpu_mesh)
    with cpu_mesh:
        for i in range(5):
            state, m = fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    ge.dryrun_multichip(4)


def test_graft_entry_forward_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    assert out.shape == (1024, 3)


def test_sharded_barf_matches_unsharded(cpu_mesh, tmp_path_factory):
    """BARF + mesh: band weights reach the Pallas kernel as explicit
    replicated shard_map operands (ADVICE r4 #1). Sharded == unsharded
    through the real kernel (interpret mode) with BARF c2f active."""
    from benerf_tpu.ops import mlp as mlp_ops

    cfg, scene, batch = _setup(tmp_path_factory)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, use_pallas=True, use_barf_c2f=True,
        barf_c2f_start=0.0, barf_c2f_end=0.8, max_iter=100,
    )
    H, W = scene.image.shape[1:3]
    key = jax.random.PRNGKey(1)
    mlp_ops.force_interpret(True)
    try:
        state_a = step_mod.init_state(cfg, jax.random.PRNGKey(0))
        # step > 0 so the BARF band weights are a non-trivial partial window
        state_a = state_a._replace(step=jnp.asarray(30, jnp.int32))
        fn_plain = step_mod.make_train_step(cfg, H, W, mesh=None)
        out_a, m_a = fn_plain(state_a, batch, key)

        state_b = step_mod.init_state(cfg, jax.random.PRNGKey(0))
        state_b = state_b._replace(step=jnp.asarray(30, jnp.int32))
        state_b = mesh_mod.replicate_tree(state_b, cpu_mesh)
        fn_mesh = step_mod.make_train_step(cfg, H, W, mesh=cpu_mesh)
        with cpu_mesh:
            out_b, m_b = fn_mesh(state_b, batch, key)
    finally:
        mlp_ops.force_interpret(False)

    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out_a.params),
                    jax.tree.leaves(out_b.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
