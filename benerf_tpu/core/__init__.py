from benerf_tpu.core import config, rng

__all__ = ["config", "rng"]
