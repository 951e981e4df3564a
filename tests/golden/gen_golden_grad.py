"""Generate END-TO-END loss + gradient parity fixtures from the PyTorch
reference at /root/reference (read-only oracle).

This closes the north-star gap left by gen_golden.py (forward-only): for a
tiny scene with every stochastic draw RECORDED as data, it runs the
reference's full training-iteration forward (Graph.forward at
model/nerf.py:160-234) and loss (train.py:204-331), then loss.backward(),
and records:
  - each loss term (event fine/coarse, rgb fine/coarse, total),
  - d loss / d {spline knots, event->rgb transform, MLP layer-0 + rgb head}
    for both the coarse and fine NeRFs.

Torch RNG streams cannot be replayed in JAX, so torch.rand / torch.randn /
torch.randperm / np.random.rand are monkeypatched with recorders; the JAX
test (tests/test_golden_grad.py) injects the recorded draws through
benerf_tpu.train.step.make_loss_fn's `draws` dict and compares loss AND
gradients via allclose.

Cases:
  synthetic_gray : BeNeRF_Blender, channels=1, threshold 0.1 (safe_log branch)
  real_color     : E2NeRF_Real, channels=3, threshold -1 (lin_log + L2-norm)
  crf_gray       : BeNeRF_Blender + both CRF MLPs enabled (grads incl. CRFs)

Run: python tests/golden/gen_golden_grad.py
Writes: tests/golden/reference_golden_grad.npz
"""

import pathlib
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = pathlib.Path(__file__).parent / "reference_golden_grad.npz"

# tiny scene dims (small enough to run the 8x256 MLP on CPU in seconds)
H_RGB, W_RGB = 12, 16
H_EVT, W_EVT = 10, 14
N_EVENTS = 600
N_SAMPLES = 8
N_IMPORTANCE = 8
N_POSES = 3          # num_interpolated_pose
N_EVT_RAYS = 16
N_RGB_RAYS_TOTAL = 9  # -> 3 rays per pose


def _stub_numba():
    if "numba" in sys.modules:
        return
    mod = types.ModuleType("numba")
    mod.jit = lambda *a, **k: (lambda f: f)
    sys.modules["numba"] = mod


def make_args(dataset, channels, event_threshold, opt_crf=False):
    return types.SimpleNamespace(
        dataset=dataset,
        channels=channels,
        event_time_window=True,
        random_sampling_window=True,
        accumulate_time_length=0.3,
        event_height=H_EVT,
        event_width=W_EVT,
        sampling_event_rays=N_EVT_RAYS,
        sampling_rgb_rays=N_RGB_RAYS_TOTAL,
        num_interpolated_pose=N_POSES,
        N_samples=N_SAMPLES,
        N_importance=N_IMPORTANCE,
        use_viewdirs=True,
        ndc=True,
        multires=10,
        multires_views=4,
        i_embed=0,
        use_barf_c2f=False,
        barf_c2f_start=0.1,
        barf_c2f_end=0.5,
        max_iter=80000,
        traj="spline",
        event_loss=True,
        rgb_loss=True,
        event_threshold=event_threshold,
        event_coeff_syn=0.1,
        event_coeff_real=2.0,
        rgb_coeff=1.0,
        optimize_event_crf=opt_crf,
        optimize_rgb_crf=opt_crf,
        rgb_crf_net_hidden=0,
        rgb_crf_net_width=32,
        event_crf_net_hidden=0,
        event_crf_net_width=32,
        chunk=4096,
    )


class Recorder:
    """Monkeypatch-compatible torch RNG fns that record every draw in call
    order, generated from an independent seeded torch.Generator."""

    def __init__(self, torch, seed):
        self._rand = torch.rand
        self._randn = torch.randn
        self._randperm = torch.randperm
        self.gen = torch.Generator().manual_seed(seed)
        self.rand = []
        self.randn = []
        self.perm = []

    @staticmethod
    def _shape(args):
        if len(args) == 1 and isinstance(args[0], (tuple, list)):
            return tuple(args[0])
        # torch.Size is a tuple subclass; ints come as varargs
        if len(args) == 1 and not isinstance(args[0], int):
            return tuple(args[0])
        return tuple(args)

    def torch_rand(self, *args, **kw):
        t = self._rand(self._shape(args), generator=self.gen)
        self.rand.append(t.numpy().copy())
        return t

    def torch_randn(self, *args, **kw):
        t = self._randn(self._shape(args), generator=self.gen)
        self.randn.append(t.numpy().copy())
        return t

    def torch_randperm(self, n, **kw):
        t = self._randperm(n, generator=self.gen)
        self.perm.append(t.numpy().copy())
        return t


def run_case(torch, name, args, data, rng, f64=False):
    """One recorded reference iteration.

    f64=True runs the whole reference pipeline in float64 (the explicit
    float32 casts at model/nerf.py:208,211,275,282-283 are lifted via the
    patches below) and stores full-precision fixtures — the companion x64
    JAX test then proves the two frameworks compute the *identical*
    mathematical function to ~1e-12, so any fp32 test scatter is provably
    rounding, not math divergence.
    """
    from model import optimize
    from run_nerf_helpers import init_nerf
    from utils import event_utils, math_utils, img_utils

    store = (lambda a: np.asarray(a)) if f64 else (
        lambda a: np.asarray(a, np.float32))

    # --- scene inputs (recorded) ------------------------------------------
    x = rng.integers(0, W_EVT, size=N_EVENTS).astype(np.int64)
    y = rng.integers(0, H_EVT, size=N_EVENTS).astype(np.int64)
    # float32-representable timestamps so the float64 window comparisons here
    # agree bit-for-bit with the float32 comparisons on the JAX side
    ts = np.sort(rng.random(N_EVENTS).astype(np.float32).astype(np.float64))
    pol = rng.choice(np.array([-1.0, 1.0]), size=N_EVENTS)
    events = {"x": x, "y": y, "ts": ts, "pol": pol}
    # float32-exact pixel values: exact under both storage precisions
    img = rng.random((1, H_RGB, W_RGB, args.channels)).astype(
        np.float32).astype(np.float64)
    # f64 case uses [0.25, 0.75]: binary-exact so the reference's f32
    # linspace of virtual-pose times equals the f64 one bit-for-bit
    rgb_exp_ts = (np.array([0.25, 0.75]) if f64
                  else np.array([0.2, 0.8], dtype=np.float64))
    K_rgb = np.array(
        [[20.0, 0, W_RGB / 2], [0, 20.0, H_RGB / 2], [0, 0, 1]], np.float32
    )
    K_evt = np.array(
        [[18.0, 0, W_EVT / 2], [0, 18.0, H_EVT / 2], [0, 0, 1]], np.float32
    )
    p = f"{name}::"
    data[p + "evt_x"] = x
    data[p + "evt_y"] = y
    data[p + "evt_ts"] = store(ts)
    data[p + "evt_pol"] = store(pol)
    data[p + "img"] = store(img)
    data[p + "rgb_exp_ts"] = store(rgb_exp_ts)
    data[p + "K_rgb"] = K_rgb
    data[p + "K_evt"] = K_evt

    # --- model with synthesized parameters ---------------------------------
    # NeRF weights come from the shared deterministic generator (param_gen),
    # NOT the fixture: they are inputs both sides can reconstruct, and
    # storing 6 cases x 2 MLPs was 40 MB of the fixture.
    import param_gen

    torch.manual_seed(11)
    model = optimize.Model(args)
    graph = model.build_network(args)
    init_nerf(graph.nerf)
    init_nerf(graph.nerf_fine)
    knots = rng.normal(scale=0.1, size=(4, 6)).astype(np.float32)
    trans = rng.normal(scale=0.01, size=(1, 6)).astype(np.float32)
    dd = torch.get_default_dtype()
    graph.evt_knot_pose_se3.params.weight.data = torch.tensor(knots, dtype=dd)
    graph.transform.params.weight.data = torch.tensor(trans, dtype=dd)
    data[p + "knots"] = knots
    data[p + "transform"] = trans
    for net, tag in ((graph.nerf, "nerf"), (graph.nerf_fine, "nerf_fine")):
        sd = param_gen.nerf_state_dict(name, tag, args.channels, f64=f64)
        net.load_state_dict(
            {k: torch.tensor(v, dtype=dd) for k, v in sd.items()}
        )
    if args.optimize_rgb_crf:
        for k, v in graph.rgb_crf.mlp_gray.state_dict().items():
            data[f"{p}rgb_crf::{k}"] = v.numpy().copy()
        for k, v in graph.event_crf.mlp_luminance.state_dict().items():
            data[f"{p}event_crf::{k}"] = v.numpy().copy()

    # --- monkeypatched forward with recorded randomness --------------------
    import zlib

    # stable across interpreter runs (hash() is salted by PYTHONHASHSEED)
    rec = Recorder(torch, seed=zlib.crc32(name.encode()) % (2**31))
    # graph.forward computes low_t = np.random.rand(1) * (1 - window_t)
    # (model/nerf.py:165); pre-divide so the actual window start is the
    # float32-exact value we record
    window_t = args.accumulate_time_length
    low_t_want = np.float64(np.float32(0.25 + 0.3 * rng.random()))
    raw_rand = np.array([low_t_want / (1.0 - window_t)])
    low_t_actual = raw_rand[0] * (1.0 - window_t)
    up_t_actual = low_t_actual + window_t
    # no event may sit so close to a window boundary that float32 rounding
    # (f64 here vs f32 on the JAX side) could flip its inclusion
    for edge in (low_t_actual, up_t_actual):
        assert np.min(np.abs(ts - edge)) > 1e-6, "boundary collision; reseed"

    def accumulate_cpu(out, xs, ys, ps):
        idx = torch.tensor(np.array([ys, xs]), dtype=torch.long)
        vals = torch.tensor(np.ascontiguousarray(ps), dtype=torch.float32)
        sp = torch.sparse_coo_tensor(idx, vals, torch.Size(out.shape))
        out_t = torch.from_numpy(out)
        out_t += sp.to_dense()
        return out_t

    orig = (torch.rand, torch.randn, torch.randperm,
            np.random.rand, event_utils.accumulate_events_on_gpu)
    torch.rand = rec.torch_rand
    torch.randn = rec.torch_randn
    torch.randperm = rec.torch_randperm
    np.random.rand = lambda *a: raw_rand
    event_utils.accumulate_events_on_gpu = accumulate_cpu
    try:
        ret_event, ret_rgb, ray_idx_event, ray_idx_rgb, events_accu = (
            graph.forward(0, events, rgb_exp_ts, H_RGB, W_RGB, K_rgb, K_evt,
                          args, np.array([]), np.array([]))
        )
    finally:
        (torch.rand, torch.randn, torch.randperm,
         np.random.rand, event_utils.accumulate_events_on_gpu) = orig

    # store the window bounds at the precision the reference's spline
    # consumed them: f32 casts normally (model/nerf.py:208), full f64 under
    # the patched f64 run
    if f64:
        data[p + "low_t"] = np.float64(low_t_actual)
        data[p + "up_t"] = np.float64(up_t_actual)
    else:
        data[p + "low_t"] = np.float32(low_t_actual)
        data[p + "up_t"] = np.float32(up_t_actual)
    data[p + "ray_idx_evt"] = ray_idx_event.numpy()
    data[p + "ray_idx_rgb"] = ray_idx_rgb.numpy()
    data[p + "eta"] = store(events_accu.numpy())
    # call order in Graph.forward: event render (t_rand, noise_c, pdf_u,
    # noise_f) then rgb render (same 4) — model/nerf.py:217-232,297-335
    data[p + "z_u_evt"], data[p + "z_u_rgb"] = rec.rand[0], rec.rand[2]
    data[p + "pdf_u_evt"], data[p + "pdf_u_rgb"] = rec.rand[1], rec.rand[3]
    data[p + "noise_c_evt"], data[p + "noise_f_evt"] = rec.randn[0], rec.randn[1]
    data[p + "noise_c_rgb"], data[p + "noise_f_rgb"] = rec.randn[2], rec.randn[3]
    assert len(rec.rand) == 4 and len(rec.randn) == 4 and len(rec.perm) == 2

    # --- losses exactly as train.py:166-331 --------------------------------
    mse = lambda a, b: torch.mean((a - b) ** 2)
    rgb2gray = img_utils.RGB2Gray()
    n_evt = ray_idx_event.shape[0]
    g1 = {"rgb_map": ret_event["rgb_map"][:n_evt],
          "rgb0": ret_event["rgb0"][:n_evt]}
    g2 = {"rgb_map": ret_event["rgb_map"][n_evt:],
          "rgb0": ret_event["rgb0"][n_evt:]}
    if args.optimize_event_crf:
        g1 = {k: graph.event_crf.forward(v) for k, v in g1.items()}
        g2 = {k: graph.event_crf.forward(v) for k, v in g2.items()}
    rr = {"rgb_map": ret_rgb["rgb_map"], "rgb0": ret_rgb["rgb0"]}
    if args.optimize_rgb_crf:
        rr = {k: graph.rgb_crf.forward(v) for k, v in rr.items()}

    target = events_accu.reshape(-1, 1)[ray_idx_event]

    def bright(v):
        v = rgb2gray(v) if args.channels == 3 else v
        return math_utils.rgb2brightlog(v, args.dataset)

    def ev_term(a2, a1):
        diff = bright(a2) - bright(a1)
        if args.event_threshold > 0:
            return mse(diff, target * args.event_threshold) * args.event_coeff_syn
        dn = diff / (torch.linalg.norm(diff, dim=0, keepdim=True) + 1e-9)
        tn = target / (torch.linalg.norm(target, dim=0, keepdim=True) + 1e-9)
        return mse(dn, tn) * args.event_coeff_real

    event_fine = ev_term(g2["rgb_map"], g1["rgb_map"])
    event_coarse = ev_term(g2["rgb0"], g1["rgb0"])

    image = torch.Tensor(img[0]).reshape(-1, args.channels)[ray_idx_rgb]
    n_rgb = ray_idx_rgb.shape[0]

    def blur_term(rays):
        synth = rays.reshape(N_POSES, n_rgb, args.channels).mean(dim=0)
        return mse(synth, image) * args.rgb_coeff

    rgb_fine = blur_term(rr["rgb_map"])
    rgb_coarse = blur_term(rr["rgb0"])
    loss = event_fine + event_coarse + rgb_fine + rgb_coarse
    loss.backward()

    data[p + "event_loss_fine"] = event_fine.item()
    data[p + "event_loss_coarse"] = event_coarse.item()
    data[p + "rgb_loss_fine"] = rgb_fine.item()
    data[p + "rgb_loss_coarse"] = rgb_coarse.item()
    data[p + "loss"] = loss.item()
    data[p + "grad_knots"] = graph.evt_knot_pose_se3.params.weight.grad.numpy()
    data[p + "grad_transform"] = graph.transform.params.weight.grad.numpy()
    for net, tag in ((graph.nerf, "nerf"), (graph.nerf_fine, "nerf_fine")):
        data[f"{p}grad_{tag}_l0_w"] = net.pts_linears[0].weight.grad.numpy()
        data[f"{p}grad_{tag}_l0_b"] = net.pts_linears[0].bias.grad.numpy()
        data[f"{p}grad_{tag}_rgb_w"] = net.rgb_linear.weight.grad.numpy()
        data[f"{p}grad_{tag}_alpha_b"] = net.alpha_linear.bias.grad.numpy()
    if args.optimize_rgb_crf:
        for k, v in graph.rgb_crf.mlp_gray.named_parameters():
            data[f"{p}grad_rgb_crf::{k}"] = v.grad.numpy()
        for k, v in graph.event_crf.mlp_luminance.named_parameters():
            data[f"{p}grad_event_crf::{k}"] = v.grad.numpy()
    print(f"  {name}: loss={loss.item():.6f} "
          f"(ev {event_fine.item():.5f}/{event_coarse.item():.5f}, "
          f"rgb {rgb_fine.item():.5f}/{rgb_coarse.item():.5f})")


def main():
    sys.path.insert(0, REF)
    _stub_numba()
    import torch

    data = {}
    rng = np.random.default_rng(2024)
    run_case(torch, "synthetic_gray",
             make_args("BeNeRF_Blender", 1, 0.1), data, rng)
    run_case(torch, "real_color",
             make_args("E2NeRF_Real", 3, -1.0), data, rng)
    run_case(torch, "crf_gray",
             make_args("BeNeRF_Blender", 1, 0.1, opt_crf=True), data, rng)

    # --- float64 exact-math case ------------------------------------------
    # lift the reference's explicit f32 casts (values only — no math change):
    #   model/nerf.py:208,211  torch.tensor(..., dtype=float32)
    #   model/nerf.py:275,282,283  .float() on rays/viewdirs
    torch.set_default_dtype(torch.float64)
    orig_tensor, orig_float = torch.tensor, torch.Tensor.float

    def tensor_f64(*a, **kw):
        if kw.get("dtype") == torch.float32:
            kw["dtype"] = torch.float64
        return orig_tensor(*a, **kw)

    torch.tensor = tensor_f64
    torch.Tensor.float = lambda self: self
    try:
        run_case(torch, "synthetic_gray_f64",
                 make_args("BeNeRF_Blender", 1, 0.1), data, rng, f64=True)
        run_case(torch, "real_color_f64",
                 make_args("E2NeRF_Real", 3, -1.0), data, rng, f64=True)
        run_case(torch, "crf_gray_f64",
                 make_args("BeNeRF_Blender", 1, 0.1, opt_crf=True),
                 data, rng, f64=True)
    finally:
        torch.tensor = orig_tensor
        torch.Tensor.float = orig_float
        torch.set_default_dtype(torch.float32)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} with {len(data)} arrays")


if __name__ == "__main__":
    main()
