"""Golden-parity + unit tests for rays / NDC / compositing / sample_pdf and
the full hierarchical renderer."""

import jax
import jax.numpy as jnp
import numpy as np

from benerf_tpu.models import nerf, torch_compat
from benerf_tpu.render import pdf, rays, renderer, volume


def test_golden_specific_rays(golden):
    ro, rd = rays.rays_for_pixels(
        jnp.asarray(golden["rays_i"]),
        jnp.asarray(golden["rays_j"]),
        jnp.asarray(golden["rays_K"]),
        jnp.asarray(golden["rays_c2w"]),
    )
    assert np.allclose(ro, golden["rays_o"], atol=1e-5)
    assert np.allclose(rd, golden["rays_d"], atol=1e-5)


def test_golden_ndc(golden):
    o, d = rays.ndc_rays(
        400, 600, 541.850232, 1.0,
        jnp.asarray(golden["ndc_ro_in"]), jnp.asarray(golden["ndc_rd_in"]),
    )
    assert np.allclose(o, golden["ndc_ro_out"], atol=1e-5)
    assert np.allclose(d, golden["ndc_rd_out"], atol=1e-5)


def test_golden_composite(golden):
    out = volume.composite(
        jnp.asarray(golden["comp_raw"]),
        jnp.asarray(golden["comp_z"]),
        jnp.asarray(golden["comp_raysd"]),
        channels=3,
        noise_std=0.0,
        key=None,
    )
    assert np.allclose(out["rgb_map"], golden["comp_rgb_map"], atol=1e-5)
    assert np.allclose(out["disp_map"], golden["comp_disp"], atol=1e-4)
    assert np.allclose(out["acc_map"], golden["comp_acc"], atol=1e-5)
    assert np.allclose(out["weights"], golden["comp_weights"], atol=1e-5)
    assert np.allclose(out["depth_map"], golden["comp_depth"], atol=1e-5)
    assert np.allclose(out["sigma"], golden["comp_sigma"], atol=1e-5)


def test_golden_sample_pdf(golden):
    s = pdf.sample_pdf(
        jnp.asarray(golden["pdf_bins"]),
        jnp.asarray(golden["pdf_weights"]),
        64,
        u=jnp.asarray(golden["pdf_u"]),
    )
    assert np.allclose(s, golden["pdf_samples"], atol=1e-5)


def test_sample_pdf_det_sorted_and_in_range():
    rng = np.random.default_rng(0)
    bins = jnp.asarray(np.sort(rng.random((5, 63)).astype(np.float32), axis=-1))
    w = jnp.asarray(rng.random((5, 62)).astype(np.float32))
    s = np.asarray(pdf.sample_pdf(bins, w, 64))
    assert s.shape == (5, 64)
    assert np.all(s >= np.asarray(bins)[:, :1] - 1e-6)
    assert np.all(s <= np.asarray(bins)[:, -1:] + 1e-6)
    assert np.all(np.diff(s, axis=-1) >= -1e-6)


def test_stratified_z_bounds():
    z = volume.stratified_z(jax.random.PRNGKey(0), 100, 64)
    assert z.shape == (100, 64)
    assert np.all(np.asarray(z) >= 0.0) and np.all(np.asarray(z) <= 1.0)
    assert np.all(np.diff(np.asarray(z), axis=-1) > 0)
    zd = volume.stratified_z(None, 4, 8)
    assert np.allclose(zd[0], np.linspace(0, 1, 8), atol=1e-7)


def _tiny_settings(**kw):
    base = dict(
        n_samples=8, n_importance=8, channels=3, ndc=True,
        sigma_noise_std=0.0, use_pallas=False,
    )
    base.update(kw)
    return renderer.RenderSettings(**base)


def test_render_rays_shapes_and_finite():
    key = jax.random.PRNGKey(0)
    p_coarse = nerf.init_params(jax.random.PRNGKey(1))
    p_fine = nerf.init_params(jax.random.PRNGKey(2))
    R = 16
    ro = jnp.asarray([[0.0, 0.0, 1.0]] * R)
    rd = jax.random.normal(key, (R, 3)) * 0.1 + jnp.asarray([0.0, 0.0, -1.0])
    out = renderer.render_rays(
        p_coarse, p_fine, ro, rd, _tiny_settings(), 40, 60, 50.0,
        keys={"z": key},
    )
    for k in ("rgb_map", "rgb0"):
        assert out[k].shape == (R, 3)
        assert np.all(np.isfinite(out[k]))
    assert out["sigma"].shape == (R, 16)


def test_render_poses_pose_major_layout():
    """First R rows belong to pose 0, next R to pose 1 (model/nerf.py:241-254)."""
    p_coarse = nerf.init_params(jax.random.PRNGKey(1))
    p_fine = nerf.init_params(jax.random.PRNGKey(2))
    K = jnp.asarray([[50.0, 0, 30.0], [0, 50.0, 20.0], [0, 0, 1]])
    eye = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [1.0]])], -1)
    shifted = eye.at[0, 3].add(0.5)
    poses = jnp.stack([eye, shifted])
    ray_idx = jnp.asarray([5, 17, 100])
    out = renderer.render_poses_with_ray_idx(
        p_coarse, p_fine, poses, ray_idx, K, 40, 60, _tiny_settings()
    )
    single = renderer.render_poses_with_ray_idx(
        p_coarse, p_fine, poses[:1], ray_idx, K, 40, 60, _tiny_settings()
    )
    assert out["rgb_map"].shape == (6, 3)
    assert np.allclose(out["rgb_map"][:3], single["rgb_map"], atol=1e-6)


def test_renderer_grads_flow_to_pose():
    """Pixel gradients must flow through ray generation into the pose — the
    core BeNeRF requirement (backprop to spline knots)."""
    p_coarse = nerf.init_params(jax.random.PRNGKey(1))
    p_fine = nerf.init_params(jax.random.PRNGKey(2))
    K = jnp.asarray([[50.0, 0, 30.0], [0, 50.0, 20.0], [0, 0, 1]])

    def loss(tx):
        pose = jnp.concatenate(
            [jnp.eye(3), jnp.asarray([[tx], [0.0], [1.0]])], -1
        )[None]
        out = renderer.render_poses_with_ray_idx(
            p_coarse, p_fine, pose, jnp.asarray([10, 20]), K, 40, 60,
            _tiny_settings(),
        )
        return jnp.sum(out["rgb_map"] ** 2) + jnp.sum(out["rgb0"] ** 2)

    g = jax.grad(loss)(0.3)
    assert np.isfinite(g)


def test_merge_sorted_equals_sort():
    """merge_sorted == sort(concat) for sorted inputs, including ties."""
    from benerf_tpu.render import pdf as pdfm

    key = jax.random.PRNGKey(3)
    a = jnp.sort(jax.random.uniform(key, (17, 64)), axis=-1)
    b = jnp.sort(jax.random.uniform(jax.random.PRNGKey(4), (17, 64)), axis=-1)
    merged = pdfm.merge_sorted(a, b)
    ref = jnp.sort(jnp.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_array_equal(np.asarray(merged), np.asarray(ref))
    # exact ties across the two arrays
    a2 = jnp.asarray([[0.0, 0.5, 0.5, 1.0]])
    b2 = jnp.asarray([[0.5, 0.5, 2.0]])
    np.testing.assert_array_equal(
        np.asarray(pdfm.merge_sorted(a2, b2)),
        np.asarray(jnp.sort(jnp.concatenate([a2, b2], -1), -1)),
    )


def test_sample_pdf_sorted_draws():
    """sorted_draws returns ascending samples whose distribution matches the
    iid path (same histogram over many draws)."""
    from benerf_tpu.render import pdf as pdfm

    bins = jnp.linspace(0.0, 1.0, 17)[None].repeat(256, 0)
    w = jax.random.uniform(jax.random.PRNGKey(0), (256, 16)) + 0.1
    s_sorted = pdfm.sample_pdf(bins, w, 64, key=jax.random.PRNGKey(1),
                               sorted_draws=True)
    s_iid = pdfm.sample_pdf(bins, w, 64, key=jax.random.PRNGKey(2))
    assert np.all(np.diff(np.asarray(s_sorted), axis=-1) >= 0)
    h1, _ = np.histogram(np.asarray(s_sorted), bins=20, range=(0, 1))
    h2, _ = np.histogram(np.asarray(s_iid), bins=20, range=(0, 1))
    n = s_iid.size
    # chi-square-ish closeness of the two empirical distributions
    rel = np.abs(h1 - h2) / np.maximum(np.sqrt(h1 + h2), 1)
    assert np.max(rel) < 6.0, (h1, h2)


def test_fast_ray_sampling_subset():
    """approx_max_k subset: k distinct in-range indices, roughly uniform."""
    import jax.lax as lax

    n, k = 40000, 1024
    counts = np.zeros(n)
    for seed in range(5):
        keys = jax.random.uniform(jax.random.PRNGKey(seed), (n,))
        _, idx = lax.approx_max_k(keys, k)
        idx = np.asarray(idx)
        assert len(np.unique(idx)) == k
        assert idx.min() >= 0 and idx.max() < n
        counts[idx] += 1
    # no index should be systematically excluded or hugely favored
    assert counts.max() <= 5
    assert (counts > 0).sum() > 3 * k  # spread across many indices


def test_joint_family_render_matches_separate():
    """render_ray_families concatenates families around the MLP calls only;
    every per-ray output must equal the one-family render exactly (the train
    step ships the joint path — PROFILE_r04.md cross-call fusion)."""
    key = jax.random.PRNGKey(0)
    p_c = nerf.init_params(jax.random.PRNGKey(1))
    p_f = nerf.init_params(jax.random.PRNGKey(2))
    settings = renderer.RenderSettings(
        n_samples=8, n_importance=8, channels=3, use_pallas=False
    )

    def fam(seed, R, H, W, focal):
        k = jax.random.PRNGKey(seed)
        rays_o = jnp.zeros((R, 3)) + jnp.asarray([0.0, 0.0, 1.0])
        rays_d = (jax.random.normal(k, (R, 3)) * 0.05
                  + jnp.asarray([0.0, 0.0, -1.0]))
        keys = {
            "z": jax.random.fold_in(k, 1),
            "pdf": jax.random.fold_in(k, 2),
            "noise_c": jax.random.fold_in(k, 3),
            "noise_f": jax.random.fold_in(k, 4),
        }
        return dict(rays_o=rays_o, rays_d=rays_d, H=H, W=W, focal=focal,
                    keys=keys)

    f0 = fam(10, 24, 40, 40, 50.0)
    f1 = fam(11, 17, 30, 50, 70.0)  # different camera AND ray count

    joint = renderer.render_ray_families(p_c, p_f, [f0, f1], settings)
    solo = [
        renderer.render_rays(p_c, p_f, f["rays_o"], f["rays_d"], settings,
                             f["H"], f["W"], f["focal"], keys=f["keys"])
        for f in (f0, f1)
    ]
    for j, s in zip(joint, solo):
        assert set(j) == set(s)
        for k in j:
            np.testing.assert_allclose(
                np.asarray(j[k]), np.asarray(s[k]), rtol=0, atol=1e-6,
                err_msg=k,
            )
