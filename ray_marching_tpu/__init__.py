"""tpu-sdf-renderer: a TPU-native differentiable sphere-tracing renderer.

Built from scratch in JAX/XLA/Pallas with the full capabilities of the PyTorch
reference `kyle-rosa/ray_marching` (see SURVEY.md): constructive SDF geometry,
quaternion-encoded rigid transforms, a differentiable sphere-tracing marcher,
tetrahedral finite-difference normals/Laplacians, and an eight-shader stack —
all pure functions over parameter pytrees, jittable and shardable over device
meshes.
"""

from ray_marching_tpu import quat
from ray_marching_tpu.camera import Camera
from ray_marching_tpu.scene import graph, registry
from ray_marching_tpu.scene.graph import compile_scene, register_custom_node
from ray_marching_tpu.scene.serialize import load_scene, save_scene
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.tiled import TiledRenderer

__version__ = "0.2.0"  # keep in sync with pyproject.toml

__all__ = [
    "quat",
    "Camera",
    "graph",
    "registry",
    "compile_scene",
    "register_custom_node",
    "load_scene",
    "save_scene",
    "Renderer",
    "RenderConfig",
    "FastRenderer",
    "TiledRenderer",
]
