"""Checkpoint save/restore with working resume.

The reference saves {global_step, graph params, 5 optimizer states} as a
torch .tar every save_model_iter (train.py:442-455) but never actually
resumes training (--load_checkpoint is dead, config.py:37; SURVEY.md §5).
Here resume works: the full TrainState pytree (params + optax state + step)
round-trips losslessly.

Format: one .npz of flattened leaves + the step, rebuilt against a template
state from init_state — no pickle, no framework lock-in, readable anywhere.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ckpt_path(logdir: str, step: int) -> str:
    return os.path.join(logdir, f"{step:06d}.ckpt.npz")


def _tree_signature(state) -> str:
    """Treedef + per-leaf shapes, uniquely identifying the state structure.

    Saved alongside the leaves and checked on restore: loading a checkpoint
    into a state built with different optimize_* flags (a different optax
    treedef) would otherwise silently mis-assign arrays positionally.
    """
    leaves, treedef = jax.tree.flatten(state)
    shapes = ";".join(str(tuple(np.shape(x))) for x in leaves)
    return f"{treedef}|{shapes}"


def save(logdir: str, state) -> str:
    os.makedirs(logdir, exist_ok=True)
    leaves, _ = jax.tree.flatten(state)
    step = int(state.step)
    arrays = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["tree_signature"] = np.array(_tree_signature(state))
    path = _ckpt_path(logdir, step)
    np.savez_compressed(path, **arrays)
    return path


def latest_step(logdir: str) -> Optional[int]:
    if not os.path.isdir(logdir):
        return None
    steps = []
    for f in os.listdir(logdir):
        m = re.fullmatch(r"(\d{6})\.ckpt\.npz", f)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore(logdir: str, template, step: Optional[int] = None):
    """Rebuild a TrainState (same treedef as `template`) from disk."""
    if step is None:
        step = latest_step(logdir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {logdir}")
    data = np.load(_ckpt_path(logdir, step))
    t_leaves, treedef = jax.tree.flatten(template)
    if "tree_signature" in data:
        saved_sig = str(data["tree_signature"])
        want_sig = _tree_signature(template)
        if saved_sig != want_sig:
            raise ValueError(
                f"checkpoint structure mismatch for {_ckpt_path(logdir, step)}:"
                " the saved TrainState treedef/shapes differ from the current"
                " config's (most often from changed optimize_* flags). Saved:"
                f"\n  {saved_sig[:300]}...\nexpected:\n  {want_sig[:300]}..."
            )
    leaves = []
    for i, tmpl in enumerate(t_leaves):
        arr = data[f"leaf_{i:05d}"]
        leaves.append(jnp.asarray(arr, getattr(tmpl, "dtype", None)))
    return jax.tree.unflatten(treedef, leaves)
