"""Golden fixture: one full-frame eval render from the PyTorch reference.

Covers the eval path end-to-end (VERDICT r3 weak #8): Graph.render_video
(/root/reference/model/nerf.py:353-390) — the chunked all-pixel render that
render_image_test / render_video_test and the in-train periodic eval all
drive — recorded on a small frame and compared against
benerf_tpu.eval.frames.render_image by tests/test_eval.py.

Determinism bridge: the reference's eval path always perturbs z and applies
sigma noise (SURVEY.md §3.2 quirks). We patch:
  - torch.rand call #1 (z stratification) -> the exact t-grid that maps the
    perturbation back onto the plain linspace z ([0, .5, ..., .5, 1]);
  - torch.rand call #2 (sample_pdf u)     -> linspace(0,1,N_importance);
  - torch.randn (sigma noise)             -> zeros,
which is precisely our renderer's `deterministic=True` semantics
(render/volume.stratified_z key=None, render/pdf u=linspace, noise off).

Run: python tests/golden/gen_golden_frame.py
Writes: tests/golden/reference_golden_frame.npz
"""

import pathlib
import sys

import numpy as np

HERE = pathlib.Path(__file__).parent
sys.path.insert(0, str(HERE))

import gen_golden_grad as gg  # stubs + make_args machinery
import param_gen

OUT = HERE / "reference_golden_frame.npz"

H, W = 12, 16
N_SAMPLES = 8
N_IMPORTANCE = 8
CHANNELS = 3
CASE = "frame_case"


def main():
    gg._stub_numba()
    sys.path.insert(0, gg.REF)
    import torch

    from model import optimize

    args = gg.make_args("BeNeRF_Blender", CHANNELS, 0.1)
    args.N_samples = N_SAMPLES
    args.N_importance = N_IMPORTANCE
    args.chunk = H * W  # one chunk -> one (rand, rand) call pair per level

    torch.manual_seed(3)
    model = optimize.Model(args)
    graph = model.build_network(args)
    dd = torch.get_default_dtype()
    for net, tag in ((graph.nerf, "nerf"), (graph.nerf_fine, "nerf_fine")):
        sd = param_gen.nerf_state_dict(CASE, tag, CHANNELS)
        net.load_state_dict(
            {k: torch.tensor(v, dtype=dd) for k, v in sd.items()}
        )

    rng = np.random.default_rng(7)
    # a mild random camera pose near the origin looking down -z
    from spline import se3_to_SE3

    se3 = torch.tensor(rng.normal(scale=0.05, size=(1, 6)).astype(np.float32))
    pose = se3_to_SE3(se3).reshape(3, 4)
    K = np.array(
        [[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32
    )

    # deterministic patches (call-order based, see module docstring)
    calls = {"rand": 0}
    t_grid = np.full((N_SAMPLES,), 0.5, np.float32)
    t_grid[0], t_grid[-1] = 0.0, 1.0

    real_rand, real_randn = torch.rand, torch.randn

    def fake_rand(*shape, **kw):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])
        calls["rand"] += 1
        if calls["rand"] % 2 == 1:  # z stratification
            assert shape[-1] == N_SAMPLES, shape
            return torch.tensor(np.broadcast_to(t_grid, shape).copy())
        u = np.linspace(0.0, 1.0, shape[-1], dtype=np.float32)
        return torch.tensor(np.broadcast_to(u, shape).copy())

    def fake_randn(*shape, **kw):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])
        return torch.zeros(shape)

    torch.rand = fake_rand
    torch.randn = fake_randn
    try:
        with torch.no_grad():
            ret = graph.render_video(
                0, pose[None], H, W, torch.tensor(K), args,
                np.array([]), "rgb",
            )
    finally:
        torch.rand, torch.randn = real_rand, real_randn

    data = {
        "pose": pose.numpy(),
        "K": K,
        "rgb_map": ret["rgb_map"].numpy(),
        "disp_map": ret["disp_map"].numpy(),
        "acc_map": ret["acc_map"].numpy(),
    }
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}: rgb {data['rgb_map'].shape}, "
          f"mean {data['rgb_map'].mean():.6f}")


if __name__ == "__main__":
    main()
