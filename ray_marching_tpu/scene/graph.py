"""Declarative scene graphs and their compiler.

A scene is an immutable tree of :class:`Node` dataclasses — pure data, no
tensors, hashable, serializable. :func:`compile_scene` turns a tree into

* ``sdf(params, x, y, z) -> d`` — a pure componentwise function suitable for
  ``jax.jit``, ``jax.grad`` and Pallas kernel bodies, and
* an initial parameter pytree (nested dicts of jnp scalars/vectors) holding
  every learnable quantity: radii, halfsides, capsule endpoints, blend
  factors, orientations, translations. Every leaf is differentiable, which
  is what makes inverse rendering work (reference keeps these as
  nn.Parameters: scene/primitives.py:9,23,47-49,67,88-89 and
  scene/transformations.py:30-31,65,115,129).

The compiler produces ordinary Python closures; under ``jax.jit`` the whole
tree inlines into one XLA computation (the reference analogue is the module
recursion flattened by torch.compile, main.py:44). A vector-API wrapper
:func:`as_vector_sdf` adapts to the reference's ``(..., 3) -> (..., 1)``
convention.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable, Tuple

import jax.numpy as jnp

from ray_marching_tpu.scene import ops, primitives


class Node:
    """Base class for scene-graph nodes."""


@dataclass(frozen=True)
class Sphere(Node):
    radius: float


@dataclass(frozen=True)
class Box(Node):
    halfsides: Tuple[float, float, float]


@dataclass(frozen=True)
class Plane(Node):
    pass


@dataclass(frozen=True)
class Line(Node):
    start: Tuple[float, float, float]
    end: Tuple[float, float, float]
    radius: float


@dataclass(frozen=True)
class Disk(Node):
    radius: float


@dataclass(frozen=True)
class Torus(Node):
    radius1: float
    radius2: float


@dataclass(frozen=True)
class Affine(Node):
    """Rigid transform of a child SDF: unit quaternion + translation."""

    child: Node
    orientation: Tuple[float, float, float, float]
    translation: Tuple[float, float, float]


@dataclass(frozen=True)
class Union(Node):
    children: Tuple[Node, ...]


@dataclass(frozen=True)
class SmoothUnion(Node):
    children: Tuple[Node, ...]
    blend_k: float


@dataclass(frozen=True)
class Rounding(Node):
    child: Node
    rounding: float


@dataclass(frozen=True)
class Onion(Node):
    child: Node
    radius: float


_PRIMITIVE_FNS = {
    Sphere: primitives.sphere,
    Box: primitives.box,
    Plane: primitives.plane,
    Line: primitives.line,
    Disk: primitives.disk,
    Torus: primitives.torus,
}

# User-extensible SDF leaves: node type -> (compile_fn, init_fn). The
# in-tree NeuralSDF (scene/neural.py) and Mandelbulb (scene/fractals.py)
# register themselves through this — third-party nodes use the same door.
_CUSTOM_NODES: dict = {}


def register_custom_node(node_type, compile_fn, init_fn) -> None:
    """Register a user-defined SDF leaf node type.

    Args:
        node_type: a frozen-dataclass subclass of :class:`Node` holding the
            node's STATIC configuration (sizes, iteration counts, seeds —
            anything baked into the compiled function).
        compile_fn: ``compile_fn(node) -> f(params, x, y, z) -> d`` — builds
            the componentwise SDF closure. It must be pure jnp elementwise
            math (it runs unchanged under jit, grad, AND inside the Pallas
            mega-kernel, where only Mosaic-lowerable ops are available:
            no gathers/scatters, no atan2/acos — see scene/fractals.py for
            an inverse-trig-free example).
        init_fn: ``init_fn(node, dtype) -> params`` — the node's initial
            differentiable parameter pytree (a possibly-nested dict of jnp
            leaves; every leaf is trainable by inverse rendering).

    Registered types serialize to/from scene JSON by their class name like
    built-in nodes (scene/serialize.py), provided the defining module is
    imported before loading.
    """
    if not (isinstance(node_type, type) and issubclass(node_type, Node)):
        raise TypeError(f"node_type must subclass Node, got {node_type!r}")
    # Scene JSON addresses nodes by bare class name — catch shadowing at
    # registration time instead of silently mis-deserializing later.
    name = node_type.__name__
    builtin_names = {
        cls.__name__
        for cls in (Sphere, Box, Plane, Line, Disk, Torus, Affine, Union,
                    SmoothUnion, Rounding, Onion)
    }
    clash = next(
        (c for c in _CUSTOM_NODES if c.__name__ == name and c is not node_type),
        None,
    )
    if name in builtin_names or clash is not None:
        other = "a built-in node" if name in builtin_names else f"{clash!r}"
        raise ValueError(
            f"custom node name {name!r} collides with {other}; scene "
            f"serialization is keyed by class name — rename the class"
        )
    _CUSTOM_NODES[node_type] = (compile_fn, init_fn)


def custom_node_types():
    """Registered custom node types, keyed by class name (serialization)."""
    return {cls.__name__: cls for cls in _CUSTOM_NODES}


def _custom_entry(node):
    """Registry entry for a node, honoring subclassing (isinstance
    semantics, like the pre-registry NeuralSDF dispatch): the most-derived
    registered base wins."""
    for base in type(node).__mro__:
        entry = _CUSTOM_NODES.get(base)
        if entry is not None:
            return entry
    return None


def init_params(node: Node, dtype=jnp.float32):
    """Build the initial parameter pytree for a scene tree.

    Layout mirrors the tree: primitives contribute their scalar/vector
    fields; combinators nest children under ``c{i}`` keys. Parameterless
    nodes (Plane) contribute empty dicts.
    """
    arr = lambda v: jnp.asarray(v, dtype=dtype)
    if isinstance(node, Sphere):
        return {"radius": arr(node.radius)}
    if isinstance(node, Box):
        return {"halfsides": arr(node.halfsides)}
    if isinstance(node, Plane):
        return {}
    if isinstance(node, Line):
        return {"start": arr(node.start), "end": arr(node.end), "radius": arr(node.radius)}
    if isinstance(node, Disk):
        return {"radius": arr(node.radius)}
    if isinstance(node, Torus):
        return {"radius1": arr(node.radius1), "radius2": arr(node.radius2)}
    if isinstance(node, Affine):
        return {
            "orientation": arr(node.orientation),
            "translation": arr(node.translation),
            "child": init_params(node.child, dtype),
        }
    if isinstance(node, Union):
        return {f"c{i}": init_params(c, dtype) for i, c in enumerate(node.children)}
    if isinstance(node, SmoothUnion):
        out = {f"c{i}": init_params(c, dtype) for i, c in enumerate(node.children)}
        out["blend_k"] = arr(node.blend_k)
        return out
    if isinstance(node, Rounding):
        return {"rounding": arr(node.rounding), "child": init_params(node.child, dtype)}
    if isinstance(node, Onion):
        return {"radius": arr(node.radius), "child": init_params(node.child, dtype)}
    entry = _custom_entry(node)
    if entry is not None:
        return entry[1](node, dtype)
    raise TypeError(f"unknown scene node: {node!r}")


def compile_node(node: Node) -> Callable:
    """Compile a node tree into ``f(params, x, y, z) -> d`` (componentwise)."""
    if type(node) in _PRIMITIVE_FNS:
        return _PRIMITIVE_FNS[type(node)]
    if isinstance(node, Affine):
        child = compile_node(node.child)

        def affine_fn(params, x, y, z):
            lx, ly, lz = ops.affine_inverse_query(
                params["orientation"], params["translation"], x, y, z
            )
            return child(params["child"], lx, ly, lz)

        return affine_fn
    if isinstance(node, Union):
        children = [compile_node(c) for c in node.children]

        def union_fn(params, x, y, z):
            ds = [fn(params[f"c{i}"], x, y, z) for i, fn in enumerate(children)]
            return ops.union(ds)

        return union_fn
    if isinstance(node, SmoothUnion):
        children = [compile_node(c) for c in node.children]

        def smooth_union_fn(params, x, y, z):
            ds = [fn(params[f"c{i}"], x, y, z) for i, fn in enumerate(children)]
            return ops.smooth_union(params["blend_k"], ds)

        return smooth_union_fn
    if isinstance(node, Rounding):
        child = compile_node(node.child)

        def rounding_fn(params, x, y, z):
            return ops.rounding(params["rounding"], child(params["child"], x, y, z))

        return rounding_fn
    if isinstance(node, Onion):
        child = compile_node(node.child)

        def onion_fn(params, x, y, z):
            return ops.onion(params["radius"], child(params["child"], x, y, z))

        return onion_fn
    entry = _custom_entry(node)
    if entry is not None:
        return entry[0](node)
    raise TypeError(f"unknown scene node: {node!r}")


def as_vector_sdf(sdf_c: Callable) -> Callable:
    """Wrap a componentwise SDF into the ``(..., 3) -> (..., 1)`` convention
    used by the marcher/normals/shader stack (mirrors the reference's
    keepdim=True signature, e.g. scene/primitives.py:11-17)."""

    def sdf_vec(params, p):
        d = sdf_c(params, p[..., 0], p[..., 1], p[..., 2])
        return d[..., None]

    return sdf_vec


def compile_scene(node: Node, dtype=jnp.float32):
    """Compile a scene tree.

    Returns ``(sdf_vec, sdf_c, params)`` where ``sdf_vec(params, p)`` maps
    ``(..., 3) -> (..., 1)``, ``sdf_c(params, x, y, z)`` is the componentwise
    form, and ``params`` is the initial differentiable parameter pytree.
    """
    sdf_c = compile_node(node)
    return as_vector_sdf(sdf_c), sdf_c, init_params(node, dtype)


def param_paths(params, prefix=""):
    """Flatten a parameter pytree into sorted ``path -> leaf`` pairs."""
    out = {}
    for key in sorted(params):
        val = params[key]
        path = f"{prefix}{key}" if not prefix else f"{prefix}/{key}"
        if isinstance(val, dict):
            out.update(param_paths(val, path))
        else:
            out[path] = val
    return out


def tree_map_with_path(fn, params, prefix=""):
    """Map ``fn(path, leaf)`` over a nested-dict pytree, preserving layout."""
    out = {}
    for key, val in params.items():
        path = f"{prefix}{key}" if not prefix else f"{prefix}/{key}"
        if isinstance(val, dict):
            out[key] = tree_map_with_path(fn, val, path)
        else:
            out[key] = fn(path, val)
    return out


def node_types(node: Node):
    """Yield every node in the tree (pre-order) — used by scene validation."""
    yield node
    for field in dataclasses.fields(node):
        val = getattr(node, field.name)
        if isinstance(val, Node):
            yield from node_types(val)
        elif isinstance(val, tuple) and val and isinstance(val[0], Node):
            for child in val:
                yield from node_types(child)
