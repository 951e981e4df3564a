"""benerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for BeNeRF-style
joint recovery of a NeRF scene and a cubic SE(3) B-spline camera trajectory
from a single blurry image plus its event stream.

Built from scratch against the behavioral contract of the WU-CVGL/BeNeRF
reference (ECCV 2024); see SURVEY.md for the full component inventory and
/root/reference citations embedded throughout the docstrings.

Layering (bottom → top):
    geometry/  SE(3)/quaternion math, cubic B-spline trajectory
    models/    positional encoding, NeRF MLP params, CRF tone mappers
    ops/       Pallas TPU kernels + pure-jnp fallbacks for the hot paths
    render/    ray generation, stratified/PDF sampling, volume compositing
    data/      dataset loaders (4+1 formats), event streams, undistortion
    train/     losses, optax chains, jitted train step, training loop
    parallel/  device mesh + sharding specs (ray-data parallelism)
    eval/      PSNR/SSIM/LPIPS/BRISQUE, pose dumps, image/video writers
    cli/       train/test/evaluate entry points (reference-compatible flags)
"""

__version__ = "0.1.0"
