from benerf_tpu.ops import mlp

__all__ = ["mlp"]
