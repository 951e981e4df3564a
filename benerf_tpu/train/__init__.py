from benerf_tpu.train import loss, optim, step

__all__ = ["loss", "optim", "step"]
