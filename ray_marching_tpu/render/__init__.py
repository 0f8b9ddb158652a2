"""Rendering engine: marcher, normals estimator, shader stack, pipeline."""

from ray_marching_tpu.render import march, normals, shaders, pipeline

__all__ = ["march", "normals", "shaders", "pipeline"]
