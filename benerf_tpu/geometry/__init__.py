from benerf_tpu.geometry import se3, spline

__all__ = ["se3", "spline"]
