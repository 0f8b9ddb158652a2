"""Scene layer: declarative CSG-of-SDF descriptions compiled to pure functions.

The reference represents scenes as mutable ``nn.Module`` trees (reference:
scene/primitives.py, scene/transformations.py). Here a scene is **data**:
an immutable node tree (:mod:`ray_marching_tpu.scene.graph`) compiled once
into a pure function ``sdf(params, x, y, z) -> d`` over a parameter pytree.
That compiled form is what XLA traces and what the Pallas marching kernel
inlines — no Python recursion survives tracing.
"""

from ray_marching_tpu.scene import graph, primitives, registry
from ray_marching_tpu.scene.graph import compile_scene, register_custom_node

__all__ = [
    "graph",
    "primitives",
    "registry",
    "compile_scene",
    "register_custom_node",
]
