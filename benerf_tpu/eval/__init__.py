from benerf_tpu.eval import metrics, io, frames

__all__ = ["metrics", "io", "frames"]
