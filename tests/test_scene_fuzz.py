"""Scene compiler generality: random CSG trees and deep nesting.

The compiler must handle arbitrary nesting of all 11 node types (SURVEY.md
hard part 5) — not just the registry scenes. Properties checked: finite
SDF values, finite parameter gradients, marchability, and fast-path
agreement through the fused kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.render.march import march
from ray_marching_tpu.scene.graph import (
    Affine,
    Box,
    Disk,
    Line,
    Node,
    Onion,
    Plane,
    Rounding,
    SmoothUnion,
    Sphere,
    Torus,
    Union,
    compile_scene,
    node_types,
    param_paths,
)


def random_tree(rng, depth=0, max_depth=5) -> Node:
    leaves = [
        lambda: Sphere(radius=float(rng.uniform(0.2, 1.0))),
        lambda: Box(halfsides=tuple(rng.uniform(0.2, 1.0, 3))),
        lambda: Plane(),
        lambda: Line(
            start=tuple(rng.uniform(-1, 1, 3)),
            end=tuple(rng.uniform(-1, 1, 3)),
            radius=float(rng.uniform(0.05, 0.3)),
        ),
        lambda: Disk(radius=float(rng.uniform(0.3, 1.0))),
        lambda: Torus(
            radius1=float(rng.uniform(0.5, 1.2)),
            radius2=float(rng.uniform(0.1, 0.4)),
        ),
    ]
    if depth >= max_depth or rng.random() < 0.35:
        return leaves[rng.integers(len(leaves))]()
    kind = rng.integers(5)
    child = lambda: random_tree(rng, depth + 1, max_depth)
    if kind == 0:
        q = rng.standard_normal(4)
        q = q / np.linalg.norm(q)
        return Affine(child=child(), orientation=tuple(q),
                      translation=tuple(rng.uniform(-1, 1, 3)))
    if kind == 1:
        n = rng.integers(2, 5)
        return Union(children=tuple(child() for _ in range(n)))
    if kind == 2:
        n = rng.integers(2, 4)
        return SmoothUnion(children=tuple(child() for _ in range(n)),
                           blend_k=float(rng.uniform(4, 30)))
    if kind == 3:
        return Rounding(child=child(), rounding=float(rng.uniform(0.02, 0.2)))
    return Onion(child=child(), radius=float(rng.uniform(0.05, 0.3)))


def test_random_trees_compile_evaluate_and_differentiate():
    rng = np.random.default_rng(42)
    pts = jnp.asarray(rng.uniform(-3, 3, (64, 3)))
    for trial in range(20):
        tree = random_tree(rng)
        sdf_vec, sdf_c, params = compile_scene(tree, jnp.float64)
        d = sdf_vec(params, pts)
        assert np.isfinite(np.asarray(d)).all(), f"trial {trial}"
        if param_paths(params):
            grads = jax.grad(lambda p: jnp.sum(sdf_vec(p, pts) ** 2))(params)
            for path, g in param_paths(grads).items():
                assert np.isfinite(np.asarray(g)).all(), f"trial {trial} {path}"


def test_random_trees_fast_kernel_agrees():
    from jax.flatten_util import ravel_pytree

    from ray_marching_tpu.ops.pallas_march import pallas_march

    rng = np.random.default_rng(7)
    for trial in range(5):
        tree = random_tree(rng, max_depth=4)
        sdf_vec, sdf_c, params = compile_scene(tree, jnp.float64)
        p0 = jnp.asarray(rng.uniform(-2, 2, (1, 8, 16, 3)))
        v = rng.standard_normal((1, 8, 16, 3))
        v = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))
        want = np.asarray(march(sdf_vec, params, p0, v, 8))
        got = np.asarray(pallas_march(sdf_c, params, p0, v, 8, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12,
                                   err_msg=f"trial {trial}")


def test_deep_affine_chain():
    """20 nested rigid transforms compose correctly: the chain of small
    z-translations displaces a sphere by their sum."""
    rng = np.random.default_rng(0)
    node: Node = Sphere(radius=0.5)
    for _ in range(20):
        node = Affine(child=node, orientation=(1.0, 0.0, 0.0, 0.0),
                      translation=(0.0, 0.0, 0.1))
    sdf_vec, _, params = compile_scene(node, jnp.float64)
    # Sphere centre is now at z = 2.0.
    d = np.asarray(sdf_vec(params, jnp.asarray([[0.0, 0.0, 2.0]])))
    np.testing.assert_allclose(d, [[-0.5]], atol=1e-12)
    # All 20 translation leaves exist and receive gradients.
    paths = param_paths(params)
    assert sum(1 for k in paths if k.endswith("translation")) == 20
    grads = jax.grad(
        lambda p: jnp.sum(sdf_vec(p, jnp.asarray([[0.0, 0.0, 3.0]])))
    )(params)
    gp = param_paths(grads)
    for k, g in gp.items():
        if k.endswith("translation"):
            np.testing.assert_allclose(np.asarray(g), [0.0, 0.0, -1.0], atol=1e-12)


def test_node_types_enumeration():
    rng = np.random.default_rng(3)
    tree = random_tree(rng)
    kinds = {type(n).__name__ for n in node_types(tree)}
    assert kinds  # walks without error and sees at least the root
