"""Result IO: KITTI pose dumps, 8-bit image/video writers, JSONL metrics log.

References: utils/pose_utils.py:5-20 (KITTI rows = flattened 3x4, one pose
per line), utils/img_utils.py:19-21 (to8bit), train.py:437-439 (mp4 @30fps),
logger/wandb_logger.py (buffered scalar logging — here a JSONL sink that
works with or without wandb)."""

from __future__ import annotations

import json
import os
import warnings
import time
from typing import Optional

import numpy as np


def to8bit(x) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def save_poses_kitti(step: int, logdir: str, poses) -> str:
    """Write poses_test/poses_test_{step:06d}.txt, one 3x4 row-major pose per
    line (utils/pose_utils.py:5-20)."""
    poses_dir = os.path.join(logdir, "poses_test")
    os.makedirs(poses_dir, exist_ok=True)
    path = os.path.join(poses_dir, f"poses_test_{step:06d}.txt")
    with open(path, "w") as f:
        for pose in np.asarray(poses):
            vals = [str(float(v)) for v in pose.reshape(-1)]
            f.write(" ".join(vals) + "\n")
    return path


def save_image(path: str, img, gray: bool = False):
    from imageio.v3 import imwrite

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = to8bit(img).squeeze()
    imwrite(path, arr, mode="L" if gray else None)


def save_video(path: str, frames, fps: int = 30):
    """Write an mp4 (reference: imageio.mimsave, run_nerf_helpers.py:139).

    Falls back to per-frame PNGs next to `path` when no mp4 backend
    (ffmpeg/pyav) is installed, so trajectory export still succeeds in
    hermetic environments."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [to8bit(f).squeeze() for f in frames]
    try:
        imageio.mimsave(path, imgs, fps=fps, quality=8)
    except (ValueError, ImportError) as e:
        frame_dir = os.path.splitext(path)[0] + "_frames"
        os.makedirs(frame_dir, exist_ok=True)
        for i, img in enumerate(imgs):
            imageio.imwrite(os.path.join(frame_dir, f"{i:04d}.png"), img)
        warnings.warn(
            f"no video backend ({e}); wrote {len(imgs)} PNG frames to "
            f"{frame_dir}"
        )


class JsonlLogger:
    """Buffered per-step scalar logger -> JSONL file (+ optional wandb).

    Mirrors the WandbLogger.write/update_buffer pattern
    (logger/wandb_logger.py:9-29): scalars accumulate into a step buffer,
    flushed by update_buffer()."""

    def __init__(self, path: Optional[str], wandb_project: Optional[str] = None,
                 config: Optional[dict] = None):
        self.path = path
        self._buf = {}
        self._file = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._file = open(path, "a")
        self._wandb = None
        if wandb_project and wandb_project != "None":
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, config=config)
            except Exception:
                self._wandb = None

    def write(self, key: str, value):
        self._buf[key] = float(value)

    def write_record(self, step: int, scalars: dict):
        """Write one complete per-iteration record immediately (bypasses the
        buffer) — used for the stacked metrics of a multi-step dispatch so
        every training iteration gets its own loss point."""
        rec = {"step": int(step), **{k: float(v) for k, v in scalars.items()}}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(rec, step=step)

    def write_img(self, key: str, img, step: int):
        """Image channel (reference WandbLogger.write_img,
        logger/wandb_logger.py:14-16). JSONL gets the path only; the image
        itself goes to wandb when enabled."""
        if self._wandb is not None:
            import wandb

            self._wandb.log({key: wandb.Image(np.asarray(img))}, step=step)

    def flush(self):
        if self._file:
            self._file.flush()

    def update_buffer(self, step: int):
        if not self._buf:
            return
        rec = {"step": int(step), "time": time.time(), **self._buf}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(self._buf, step=step)
        self._buf = {}

    def close(self):
        if self._file:
            self._file.close()
