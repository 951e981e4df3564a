"""Final round-4 TPU session: regenerate the three quality artifacts at the
current HEAD (the committed ones predate the sort-free sampling and the
in-kernel BARF path, so they would not reproduce bit-for-bit from this
tree). One process, one chip claim.

Run: python tools/tpu_session_r04d.py
"""

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benerf_tpu.eval import quality

    runs = [
        ("QUALITY_r04.json", dict(use_barf_c2f=True)),
        ("QUALITY_r04_bf16.json", dict(use_barf_c2f=True,
                                       compute_dtype="bfloat16")),
        ("QUALITY_r04_best.json", dict(pose_init="motion_scale")),
    ]
    for out_name, kw in runs:
        t0 = time.time()
        try:
            art = quality.run_quality(
                f"/tmp/quality_r04d_{out_name.split('.')[0]}",
                iters=8000, evals=4, H=80, W=80, seed=0,
                target_blur_px=6.0, **kw,
            )
            with open(os.path.join(REPO, out_name), "w") as f:
                f.write(json.dumps(art, indent=2) + "\n")
            print(f"{out_name}: passed={art['passed']} "
                  f"final={art['checkpoints'][-1]} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"{out_name} FAILED", flush=True)


if __name__ == "__main__":
    main()
