from benerf_tpu.models import embedder, nerf, crf

__all__ = ["embedder", "nerf", "crf"]
