"""Execute the weight-gated eval paths (LPIPS forward, BRISQUE features +
libsvm SVR scoring) so no eval/ module ships with zero executed lines.
Real pretrained weights cannot be downloaded in this container; random
weights exercise the full architecture/shape/determinism contract, and a
hand-written libsvm file exercises the parser + predictor against a closed-
form expectation."""

import os

import numpy as np
import pytest

from benerf_tpu.eval import brisque


@pytest.fixture()
def lpips_random_weights(tmp_path, monkeypatch):
    """An empty state dict: _build loads with strict=False, leaving torch's
    random init in place — the full VGG16 + linear-head forward still runs."""
    torch = pytest.importorskip("torch")
    from benerf_tpu.eval import lpips_torch

    torch.manual_seed(0)
    path = os.path.join(str(tmp_path), "empty_lpips.pth")
    torch.save({}, path)
    monkeypatch.setattr(lpips_torch, "_MODEL", None)
    monkeypatch.setenv("BENERF_LPIPS_WEIGHTS", path)
    yield lpips_torch
    lpips_torch._MODEL = None


def test_lpips_forward_zero_on_identical(lpips_random_weights):
    lp = lpips_random_weights
    rng = np.random.default_rng(0)
    img = rng.random((33, 41, 3))
    assert lp.compute(img, img) == pytest.approx(0.0, abs=1e-8)


def test_lpips_forward_positive_and_deterministic(lpips_random_weights):
    lp = lpips_random_weights
    rng = np.random.default_rng(1)
    a = rng.random((32, 32, 3))
    b = rng.random((32, 32, 3))
    d1 = lp.compute(a, b)
    d2 = lp.compute(a, b)
    assert np.isfinite(d1) and d1 != 0.0
    assert d1 == d2
    # grayscale (H, W) inputs are broadcast to 3 channels
    g = rng.random((32, 32))
    assert np.isfinite(lp.compute(g, g + 0.1))


def test_lpips_gated_returns_none_without_weights(monkeypatch):
    from benerf_tpu.eval import lpips_torch, metrics

    monkeypatch.delenv("BENERF_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(lpips_torch, "_MODEL", None)
    img = np.zeros((16, 16, 3))
    assert metrics.lpips(img, img) is None


# ------------------------------------------------------------------ BRISQUE


def test_brisque_features_contract():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3))
    f = brisque.features(img)
    assert f.shape == (36,)
    assert np.all(np.isfinite(f))
    # a heavily blurred image has measurably different MSCN statistics
    from scipy.ndimage import gaussian_filter

    blurred = gaussian_filter(img, (4, 4, 0))
    f2 = brisque.features(blurred)
    assert not np.allclose(f, f2, atol=1e-3)


_LIBSVM_MODEL = """svm_type epsilon_svr
kernel_type rbf
gamma 0.05
nr_class 2
total_sv 2
rho 0.25
SV
1.5 1:0.1 2:0.2 3:0.3
-0.7 1:1.0 36:2.0
"""


def test_brisque_libsvm_parser_and_predict(tmp_path):
    path = os.path.join(str(tmp_path), "model.txt")
    with open(path, "w") as f:
        f.write(_LIBSVM_MODEL)
    model = brisque._load_libsvm_model(path)
    assert model["gamma"] == 0.05 and model["rho"] == 0.25
    assert model["svs"].shape == (2, 36)
    np.testing.assert_allclose(model["coefs"], [1.5, -0.7])
    np.testing.assert_allclose(model["svs"][0, :3], [0.1, 0.2, 0.3])
    assert model["svs"][1, 35] == 2.0

    x = np.linspace(0.0, 1.0, 36)
    sv = model["svs"]
    k = np.exp(-0.05 * np.sum((sv - x) ** 2, axis=1))
    expected = 1.5 * k[0] - 0.7 * k[1] - 0.25
    assert brisque._svr_predict(model, x) == pytest.approx(expected, rel=1e-12)


def test_brisque_score_gating(tmp_path, monkeypatch):
    rng = np.random.default_rng(3)
    img = rng.random((48, 48))
    monkeypatch.delenv("BENERF_BRISQUE_MODEL", raising=False)
    assert brisque.score(img) is None

    path = os.path.join(str(tmp_path), "model.txt")
    with open(path, "w") as f:
        f.write(_LIBSVM_MODEL)
    monkeypatch.setenv("BENERF_BRISQUE_MODEL", path)
    s = brisque.score(img)
    assert s is not None and np.isfinite(s)
