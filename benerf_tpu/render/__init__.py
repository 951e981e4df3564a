from benerf_tpu.render import rays, volume, pdf, renderer

__all__ = ["rays", "volume", "pdf", "renderer"]
