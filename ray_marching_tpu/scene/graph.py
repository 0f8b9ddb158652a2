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
import math
import os
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

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


def subtree_leaf_count(node: Node) -> int:
    """Number of primitive/custom leaves under ``node`` — the cost proxy
    the union short-circuit uses to decide whether a child is worth a
    guarded skip (a lone sphere costs less than its own bound check)."""
    child = getattr(node, "child", None)
    if child is not None:
        return subtree_leaf_count(child)
    children = getattr(node, "children", ())
    if children:
        return sum(subtree_leaf_count(c) for c in children)
    return 1


def bounding_sphere_fn(node: Node) -> Optional[Callable]:
    """Runtime bounding sphere of a subtree: ``fn(params) -> (cx, cy, cz, R)``.

    The returned scalars are traced from the CURRENT parameters (radii,
    translations, blend factors are learnable and move during inverse
    rendering — a static bound would go stale), and satisfy the skip
    invariant used by the compiled union:

        d_subtree(p) >= |p - c| - R   for ALL p (inside or out).

    Proof sketch: the subtree's zero level set lies inside ball(c, R); for
    any p the segment to the nearest ball-boundary point crosses the
    surface, so the (signed) distance obeys the bound even at negative d.
    Per node: Sphere/Box/Disk/Torus are origin-centred with closed-form
    radii; Line covers its capsule; Union takes the enclosing ball of the
    child balls; SmoothUnion additionally inflates by ``log(n)/k`` (the
    LSE soft-min undershoots the hard min by at most that; k <= 0 yields
    R = inf, i.e. never skip); Onion/Rounding inflate by their radius;
    Affine re-centres at its translation and engages only while the
    quaternion is unit-or-expanding (a contracting q shrinks the field's
    growth slope below 1 and no sphere-form bound is valid — R = inf
    then). Unbounded nodes (Plane, NeuralSDF and other custom fields)
    return None, which disables the skip for every ancestor union child
    containing them.
    """
    if isinstance(node, Sphere):
        return lambda p: (0.0, 0.0, 0.0, jnp.abs(p["radius"]))
    if isinstance(node, Box):
        return lambda p: (
            0.0, 0.0, 0.0, jnp.sqrt(jnp.sum(p["halfsides"] ** 2))
        )
    if isinstance(node, Disk):
        return lambda p: (0.0, 0.0, 0.0, jnp.abs(p["radius"]))
    if isinstance(node, Torus):
        return lambda p: (
            0.0, 0.0, 0.0, jnp.abs(p["radius1"]) + jnp.abs(p["radius2"])
        )
    if isinstance(node, Line):

        def line_bound(p):
            c = (p["start"] + p["end"]) * 0.5
            half = jnp.sqrt(jnp.sum((p["end"] - p["start"]) ** 2)) * 0.5
            return c[0], c[1], c[2], half + jnp.abs(p["radius"])

        return line_bound
    if isinstance(node, Affine):
        child = bounding_sphere_fn(node.child)
        if child is None:
            return None

        def affine_bound(p):
            cx, cy, cz, r = child(p["child"])
            q = p["orientation"]
            t = p["translation"]
            # The inverse query l = A(p - t) scales lengths by the
            # smallest singular value s_min = min(1, m),
            # m = sqrt((1-2u)^2 + 4w^2 u) (the 2-cross rotation identity
            # at non-unit |q|; m = 1 exactly on S^3). A sphere-form bound
            # (slope 1 in |p - t|) is only valid when s_min >= 1: for a
            # CONTRACTING quaternion (m < 1) the true field grows at
            # slope s_min and any slope-1 lb eventually overtakes it —
            # an earlier (|c|+R)/s_min "rescaled radius" version had
            # exactly that flaw. So the bound engages only when
            # m >= 1 - 16 ulp (unit-to-rounding or expanding; the <=16ulp
            # slope deficit is absorbed by the caller's 32-ulp lb
            # shrink), and reports R = inf — never skip — otherwise,
            # staying safe when optimization drags q inside S^3.
            u = q[1] ** 2 + q[2] ** 2 + q[3] ** 2
            m = jnp.sqrt((1.0 - 2.0 * u) ** 2 + 4.0 * q[0] ** 2 * u)
            c_norm = jnp.sqrt(cx * cx + cy * cy + cz * cz)
            tol = 16 * jnp.finfo(jnp.result_type(m)).eps
            r_eff = jnp.where(m >= 1.0 - tol, c_norm + r, jnp.inf)
            return t[0], t[1], t[2], r_eff

        return affine_bound
    if isinstance(node, (Union, SmoothUnion)):
        fns = [bounding_sphere_fn(c) for c in node.children]
        if any(f is None for f in fns):
            return None
        n = len(node.children)
        smooth = isinstance(node, SmoothUnion)

        def union_bound(p):
            balls = [f(p[f"c{i}"]) for i, f in enumerate(fns)]
            cx = sum(b[0] for b in balls) / n
            cy = sum(b[1] for b in balls) / n
            cz = sum(b[2] for b in balls) / n
            r = balls[0][3] + jnp.sqrt(
                (balls[0][0] - cx) ** 2 + (balls[0][1] - cy) ** 2
                + (balls[0][2] - cz) ** 2
            )
            for bx, by, bz, br in balls[1:]:
                r = jnp.maximum(
                    r,
                    br + jnp.sqrt(
                        (bx - cx) ** 2 + (by - cy) ** 2 + (bz - cz) ** 2
                    ),
                )
            if smooth:
                k = p["blend_k"]
                r = jnp.where(k > 0, r + math.log(n) / k, jnp.inf)
            return cx, cy, cz, r

        return union_bound
    if isinstance(node, Rounding):
        child = bounding_sphere_fn(node.child)
        if child is None:
            return None

        def rounding_bound(p):
            cx, cy, cz, r = child(p["child"])
            return cx, cy, cz, r + p["rounding"]

        return rounding_bound
    if isinstance(node, Onion):
        child = bounding_sphere_fn(node.child)
        if child is None:
            return None

        def onion_bound(p):
            cx, cy, cz, r = child(p["child"])
            return cx, cy, cz, r + jnp.abs(p["radius"])

        return onion_bound
    return None  # Plane (unbounded) and custom nodes (NeuralSDF, ...)


#: Union short-circuiting (RM_TPU_CSG_PRUNE=0 disables): children after the
#: first whose subtree has >= RM_TPU_PRUNE_MIN_LEAVES leaves and a
#: computable bounding sphere are evaluated under a lax.cond that skips the
#: whole subtree when EVERY query point in the block is provably farther
#: from it than the running prefix min (lb > d, strict) — then
#: min(d, d_child) = d exactly, with no ties, so values match the unpruned
#: form. ``prune=True`` output is FORWARD-ONLY (the conditional is a
#: 0/1-trip while_loop — no autodiff rule) and is requested ONLY for SDFs
#: traced into NON-DIFFERENTIATED Pallas forward-kernel bodies
#: (render/fast.py's mega-kernel behind its custom_vjp), where the skip is
#: a scalar per-ray-tile branch with no collectives. Two hazards keep it
#: out of everything else: (a) lax.cond would be differentiable but Mosaic
#: cannot legalize vector-result scf.if (probed v5e); (b) a shard-varying
#: conditional on a plain-XLA path under shard_map puts the transpose's
#: replicated-param psum INSIDE the conditional — shards that skipped
#: never join the all-reduce (measured on CPU: garbage gradients, then a
#: collective-rendezvous crash).
#:
#: DEFAULT OFF — measured NEGATIVE on v5e (round 5, 1080p test_scene2,
#: bench.py A/B): pruned forward 517 M rays/s vs 990 M unpruned, fwd+bwd
#: 210 M vs 258 M. The skip itself is sound and fires, but Mosaic's only
#: legal conditional (a 0/1-trip while) costs ~200 ns per instance and
#: defeats cross-step software pipelining: ~37 conditionals per tile per
#: frame (32 march steps + 5 normals evals) × ~253 tiles ≈ 1.9 ms of
#: overhead against a 2.1 ms all-eval forward that already runs at the
#: elementwise roofline. A whole-march per-tile specialization (reduced
#: scene for tiles whose ray lines miss the subtree) is NOT a sound
#: alternative: it changes step sizes for grazing rays — different
#: trajectories than the reference's unconditional full-min march.
def _prune_enabled() -> bool:
    return os.environ.get("RM_TPU_CSG_PRUNE", "0") == "1"


def _prune_min_leaves() -> int:
    return int(os.environ.get("RM_TPU_PRUNE_MIN_LEAVES", "2"))


def compile_node(node: Node, prune: bool = False) -> Callable:
    """Compile a node tree into ``f(params, x, y, z) -> d`` (componentwise).

    ``prune=True`` compiles unions with the bounding-sphere short-circuit;
    the result is FORWARD-ONLY and for non-differentiated kernel bodies
    only — see the note above _prune_enabled.
    """
    if type(node) in _PRIMITIVE_FNS:
        return _PRIMITIVE_FNS[type(node)]
    if isinstance(node, Affine):
        child = compile_node(node.child, prune)

        def affine_fn(params, x, y, z):
            lx, ly, lz = ops.affine_inverse_query(
                params["orientation"], params["translation"], x, y, z
            )
            return child(params["child"], lx, ly, lz)

        return affine_fn
    if isinstance(node, Union):
        children = [compile_node(c, prune) for c in node.children]
        bounds: list = [None]  # the first child seeds the prefix min
        if prune:
            min_leaves = _prune_min_leaves()
            bounds += [
                bounding_sphere_fn(c)
                if subtree_leaf_count(c) >= min_leaves else None
                for c in node.children[1:]
            ]
        else:
            bounds += [None] * (len(node.children) - 1)

        if not any(b is not None for b in bounds):

            def union_fn(params, x, y, z):
                ds = [
                    fn(params[f"c{i}"], x, y, z)
                    for i, fn in enumerate(children)
                ]
                return ops.union(ds)

            return union_fn

        from jax import lax

        from ray_marching_tpu.utils import vmin

        def union_pruned_fn(params, x, y, z):
            d = children[0](params["c0"], x, y, z)
            for i in range(1, len(children)):
                fn = children[i]
                pi = params[f"c{i}"]
                if bounds[i] is None:
                    d = vmin(d, fn(pi, x, y, z))
                    continue
                cx, cy, cz, radius = bounds[i](pi)
                ex, ey, ez = x - cx, y - cy, z - cz
                # 32-ulp shrink: the bound arithmetic (square-sum, sqrt,
                # the R chain) rounds, and an over-estimated lb could skip
                # a child that is genuinely the min by up to that error.
                tol = 32 * jnp.finfo(jnp.result_type(x)).eps
                lb = (
                    jnp.sqrt(ex * ex + ey * ey + ez * ez) * (1.0 - tol)
                    - radius
                )
                # Strict > makes the skip exact INCLUDING tie-routing:
                # d_child >= lb > d everywhere means vmin(d, d_child) = d
                # with no ties — skipping contributes nothing.
                #
                # The conditional is a 0/1-trip lax.while_loop, NOT
                # lax.cond: Mosaic cannot legalize vector-result scf.if
                # ("failed to legalize operation 'scf.if'", probed on
                # v5e round 5) but lowers while loops with plane carries
                # (the tau early-exit march relies on that). The price:
                # while_loop has no JVP/VJP rule, so THIS FUNCTION IS
                # FORWARD-ONLY — it must never be differentiated. The
                # fused render paths honor that by tracing it only into
                # the custom_vjp'd forward kernels; every autodiff
                # consumer (the fused backward kernel, IFT jnp math, XLA
                # recomputes) gets the plain compile.
                need = jnp.logical_not(jnp.all(lb > d))

                def body(st, _fn=fn, _pi=pi, _x=x, _y=y, _z=z):
                    return jnp.bool_(False), vmin(
                        st[1], _fn(_pi, _x, _y, _z)
                    )

                _, d = lax.while_loop(lambda st: st[0], body, (need, d))
            return d

        return union_pruned_fn
    if isinstance(node, SmoothUnion):
        children = [compile_node(c, prune) for c in node.children]

        def smooth_union_fn(params, x, y, z):
            ds = [fn(params[f"c{i}"], x, y, z) for i, fn in enumerate(children)]
            return ops.smooth_union(params["blend_k"], ds)

        return smooth_union_fn
    if isinstance(node, Rounding):
        child = compile_node(node.child, prune)

        def rounding_fn(params, x, y, z):
            return ops.rounding(params["rounding"], child(params["child"], x, y, z))

        return rounding_fn
    if isinstance(node, Onion):
        child = compile_node(node.child, prune)

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
