"""Generate golden-value fixtures from the PyTorch reference at
/root/reference (read-only oracle; nothing is copied into the repo — the
fixtures are recorded *outputs* for fixed random inputs).

Run: python tests/golden/gen_golden.py
Writes: tests/golden/reference_golden.npz

Covers: SE(3)/quaternion maps, cubic/linear spline interpolation, positional
encoding, the full NeRF MLP forward (weights exported alongside), volume
compositing (noise off), inverse-CDF sampling (with recorded uniforms), NDC
warp, and pinhole ray generation. Torch RNG streams cannot be replayed in
JAX, so all stochastic inputs are recorded as data (SURVEY.md §7.3).
"""

import pathlib
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = pathlib.Path(__file__).parent / "reference_golden.npz"


def _stub_numba():
    """utils.event_utils imports numba (absent here); stub @jit as identity."""
    if "numba" in sys.modules:
        return
    mod = types.ModuleType("numba")
    mod.jit = lambda *a, **k: (lambda f: f)
    sys.modules["numba"] = mod


def main():
    sys.path.insert(0, REF)
    _stub_numba()

    import torch

    torch.manual_seed(0)
    rng = np.random.default_rng(42)
    data = {}

    import spline as ref_spline

    # --- se3 <-> SE3 round trips -----------------------------------------
    twists = rng.normal(scale=0.5, size=(5, 6)).astype(np.float32)
    data["se3_twists"] = twists
    Rt = ref_spline.se3_to_SE3_N(torch.tensor(twists))
    data["se3_to_SE3"] = Rt.numpy()
    back = ref_spline.SE3_to_se3_N(Rt)
    data["SE3_to_se3"] = back.numpy()

    # include a tiny-angle twist to cover the Taylor branches
    tiny = rng.normal(scale=1e-6, size=(3, 6)).astype(np.float32)
    data["se3_twists_tiny"] = tiny
    data["se3_to_SE3_tiny"] = ref_spline.se3_to_SE3_N(torch.tensor(tiny)).numpy()

    # --- exp/log quaternion maps -----------------------------------------
    r = rng.normal(scale=0.8, size=(1, 7, 3)).astype(np.float32)
    r[0, 0] = 1e-12  # Taylor branch
    data["rotvecs"] = r
    q = ref_spline.exp_r2q_parallel(torch.tensor(r))
    data["exp_r2q"] = q.numpy()
    data["log_q2r"] = ref_spline.log_q2r_parallel(q).numpy()

    # --- cubic / linear spline poses -------------------------------------
    knots = (rng.random((4, 6)).astype(np.float32) * 0.01)
    data["spline_knots"] = knots
    ts = np.array([0.0, 0.1, 0.25, 0.5, 0.77, 0.9, 1.0], dtype=np.float32)
    data["spline_ts"] = ts.copy()
    k = [torch.tensor(knots[i]).reshape(1, 1, 6) for i in range(4)]
    poses = ref_spline.cubic_spline_pose_unit_time(
        k[0], k[1], k[2], k[3], torch.tensor(ts.copy())
    )
    data["spline_poses"] = poses.numpy()
    lin = ref_spline.linear_pose_unit_time(k[0], k[3], torch.tensor(ts.copy()))
    data["linear_poses"] = lin.numpy()

    # larger-rotation knots (non-Taylor regime)
    knots_big = rng.normal(scale=0.3, size=(4, 6)).astype(np.float32)
    data["spline_knots_big"] = knots_big
    kb = [torch.tensor(knots_big[i]).reshape(1, 1, 6) for i in range(4)]
    poses_big = ref_spline.cubic_spline_pose_unit_time(
        kb[0], kb[1], kb[2], kb[3], torch.tensor(ts.copy())
    )
    data["spline_poses_big"] = poses_big.numpy()

    # --- embedder ----------------------------------------------------------
    from model import embedder as ref_embedder

    class A:
        use_barf_c2f = False
        use_viewdirs = True
        multires = 10
        multires_views = 4
        i_embed = 0

    pts = rng.normal(size=(10, 3)).astype(np.float32)
    data["pe_pts"] = pts
    embed_fn, ch = ref_embedder.get_embedder(A, 10, 0)
    data["pe_out"] = embed_fn(torch.tensor(pts)).numpy()
    assert ch == 63
    embed_fn_v, chv = ref_embedder.get_embedder(A, 4, 0)
    data["pe_out_views"] = embed_fn_v(torch.tensor(pts)).numpy()
    assert chv == 27

    # --- NeRF MLP forward --------------------------------------------------
    from model.nerf import NeRF
    from run_nerf_helpers import init_nerf, ndc_rays, get_specific_rays, sample_pdf

    torch.manual_seed(7)
    net = NeRF(D=8, W=256, input_ch=63, input_ch_views=27, output_ch=4,
               skips=[4], use_viewdirs=True, channels=3)
    init_nerf(net)
    sd = net.state_dict()
    for name, tensor in sd.items():
        data["mlp_w::" + name] = tensor.numpy()

    mpts = rng.normal(size=(4, 8, 3)).astype(np.float32)
    mdirs = rng.normal(size=(4, 3)).astype(np.float32)
    mdirs /= np.linalg.norm(mdirs, axis=-1, keepdims=True)
    data["mlp_pts"] = mpts
    data["mlp_dirs"] = mdirs
    with torch.no_grad():
        raw = net.forward(0, torch.tensor(mpts), torch.tensor(mdirs), A)
    data["mlp_raw"] = raw.numpy()

    # --- raw2output (compositing, noise off) ------------------------------
    z_vals = np.sort(rng.random((4, 8)).astype(np.float32), axis=-1)
    rays_d = rng.normal(size=(4, 3)).astype(np.float32)
    data["comp_raw"] = raw.numpy()
    data["comp_z"] = z_vals
    data["comp_raysd"] = rays_d
    with torch.no_grad():
        rgb_map, disp, acc, weights, depth, sigma = net.raw2output(
            None, False, None, torch.tensor(raw.numpy()),
            torch.tensor(z_vals), torch.tensor(rays_d), raw_noise_std=0.0,
        )
    data["comp_rgb_map"] = rgb_map.numpy()
    data["comp_disp"] = disp.numpy()
    data["comp_acc"] = acc.numpy()
    data["comp_weights"] = weights.numpy()
    data["comp_depth"] = depth.numpy()
    data["comp_sigma"] = sigma.numpy()

    # --- sample_pdf with recorded uniforms --------------------------------
    bins = np.sort(rng.random((3, 63)).astype(np.float32), axis=-1)
    w = rng.random((3, 62)).astype(np.float32)
    u = rng.random((3, 64)).astype(np.float32)
    data["pdf_bins"] = bins
    data["pdf_weights"] = w
    data["pdf_u"] = u

    # reference pytest-hook path regenerates u from np.random.seed(0); we
    # instead monkeypatch torch.rand to return our recorded uniforms.
    real_rand = torch.rand
    torch.rand = lambda *a, **k: torch.tensor(u)
    try:
        with torch.no_grad():
            samples = sample_pdf(torch.tensor(bins), torch.tensor(w), 64,
                                 det=False, pytest=False)
    finally:
        torch.rand = real_rand
    data["pdf_samples"] = samples.numpy()

    # --- ndc + rays --------------------------------------------------------
    H, W, focal = 400, 600, 541.850232
    ro = rng.normal(size=(6, 3)).astype(np.float32)
    rd = rng.normal(size=(6, 3)).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5  # forward-facing
    ro[:, 2] = np.abs(ro[:, 2]) + 2.0
    data["ndc_ro_in"], data["ndc_rd_in"] = ro, rd
    with torch.no_grad():
        o2, d2 = ndc_rays(H, W, focal, 1.0, torch.tensor(ro), torch.tensor(rd))
    data["ndc_ro_out"], data["ndc_rd_out"] = o2.numpy(), d2.numpy()

    K = np.array([[focal, 0, 300.0], [0, focal, 200.0], [0, 0, 1]], np.float32)
    data["rays_K"] = K
    i = rng.integers(0, W, size=(10,))
    j = rng.integers(0, H, size=(10,))
    c2w = ref_spline.se3_to_SE3_N(
        torch.tensor(rng.normal(scale=0.2, size=(10, 6)).astype(np.float32))
    )
    data["rays_i"], data["rays_j"] = i.astype(np.float32), j.astype(np.float32)
    data["rays_c2w"] = c2w.numpy()
    with torch.no_grad():
        ro_s, rd_s = get_specific_rays(
            torch.tensor(i.astype(np.float32)), torch.tensor(j.astype(np.float32)),
            torch.tensor(K), c2w,
        )
    data["rays_o"], data["rays_d"] = ro_s.numpy(), rd_s.numpy()

    # --- brightness log maps ----------------------------------------------
    from utils.math_utils import rgb2brightlog

    vals = np.linspace(0.0, 1.0, 32).astype(np.float32).reshape(-1, 1)
    data["bright_in"] = vals
    data["bright_safelog"] = rgb2brightlog(torch.tensor(vals), "BeNeRF_Blender").numpy()
    data["bright_linlog"] = rgb2brightlog(torch.tensor(vals), "E2NeRF_Synthetic").numpy()

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} with {len(data)} arrays")


if __name__ == "__main__":
    main()
