"""IO: image writing and checkpointing."""

from ray_marching_tpu.io.image import write_png

__all__ = ["write_png"]
