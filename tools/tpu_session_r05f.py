"""Round-5 TPU session F: harsh production-focal quality spot-check.

PROTOCOL_r05's 400x600 scene inherited wall-texture frequencies calibrated
for the demo focal (90), so at tanabata-class focal 541.85 its texture
period is ~50-90 px and the 15 px blur only costs ~6 dB (blurry input
42.2 dB). This run regenerates the scene with wall_freq_scale=6 (texture
period back to 8-16 px AT THE PRODUCTION FOCAL) and spot-checks recovery +
deblurring at 20k iters -> QUALITY_r05_harsh.json.

Run: python tools/tpu_session_r05f.py
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

    # wait for the host-side generator's sentinel (written last)
    sentinel = "/tmp/harsh/data/poses_ts.txt"
    waited = 0
    while not os.path.exists(sentinel) and waited < 3600:
        time.sleep(15)
        waited += 15
    print(f"scene sentinel after {waited}s: {os.path.exists(sentinel)}",
          flush=True)

    t0 = time.time()
    try:
        art = quality.run_quality(
            "/tmp/harsh", iters=20000, evals=4, H=400, W=600, focal=541.85,
            seed=0, target_blur_px=15.0, threshold=0.05, wall_freq_scale=6.0,
            event_threshold=0.05, pose_init="motion_scale",
            fast_ray_sampling=True, console_log_iter=1000,
        )
        with open(os.path.join(REPO, "QUALITY_r05_harsh.json"), "w") as f:
            f.write(json.dumps(art, indent=2) + "\n")
        print("QUALITY_r05_harsh:", art["passed"],
              art["checkpoints"][-1], f"({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        traceback.print_exc()
        print("harsh run FAILED", flush=True)
    print("SESSION F DONE", flush=True)


if __name__ == "__main__":
    main()
