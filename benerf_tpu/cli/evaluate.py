"""Offline folder-vs-folder evaluation CLI.

Reference-compatible (evaluate.py:37-56):
    python -m benerf_tpu.cli.evaluate --result DIR --groundtruth DIR
Computes PSNR / SSIM (/ LPIPS when weights available) over sorted image
pairs and prints the averages.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from benerf_tpu.eval import metrics as metrics_mod


def load_folder(d):
    from imageio.v3 import imread

    files = [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.lower().endswith(("jpg", "png"))
    ]
    return [np.asarray(imread(f), np.float64) / 255.0 for f in files]


def evaluate(result_dir: str, gt_dir: str):
    res = load_folder(result_dir)
    gts = load_folder(gt_dir)
    assert len(res) == len(gts), f"{len(res)} results vs {len(gts)} GT images"
    out = {"psnr": [], "ssim": [], "lpips": []}
    for r, g in zip(res, gts):
        out["psnr"].append(metrics_mod.psnr(r, g))
        out["ssim"].append(metrics_mod.ssim(r, g))
        lp = metrics_mod.lpips(r, g)
        if lp is not None:
            out["lpips"].append(lp)
    summary = {
        k: float(np.mean(v)) for k, v in out.items() if len(v) > 0
    }
    return summary


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--result", type=str, required=True)
    p.add_argument("--groundtruth", type=str, required=True)
    args = p.parse_args(argv)
    summary = evaluate(args.result, args.groundtruth)
    for k, v in summary.items():
        print(f"{k}: {v:.6f}")


if __name__ == "__main__":
    main()
