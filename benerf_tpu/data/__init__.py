from benerf_tpu.data import datasets, events, synthetic, undistort

__all__ = ["datasets", "events", "synthetic", "undistort"]
