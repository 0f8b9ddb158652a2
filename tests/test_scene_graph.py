"""Scene graph compiler: composition semantics and parameter pytrees."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.scene import ops, registry
from ray_marching_tpu.scene.graph import (
    Affine,
    Box,
    Onion,
    Rounding,
    SmoothUnion,
    Sphere,
    Torus,
    Union,
    compile_scene,
    init_params,
    param_paths,
)


def sdf_at(node, pts, dtype=jnp.float64):
    sdf_vec, _, params = compile_scene(node, dtype)
    return np.asarray(sdf_vec(params, jnp.asarray(pts, dtype)))[..., 0], params


def test_affine_translates_sphere():
    node = Affine(
        child=Sphere(radius=0.5),
        orientation=(1.0, 0.0, 0.0, 0.0),
        translation=(0.0, 0.0, 1.0),
    )
    d, _ = sdf_at(node, [[0.0, 0.0, 1.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(d, [-0.5, 0.5], atol=1e-15)


def test_affine_rotation_moves_box_corner():
    # 90° rotation about z: q = (cos45, 0, 0, sin45); world x-axis maps from
    # local y-axis, so a box elongated in local y appears elongated in world x.
    s = np.sqrt(0.5)
    node = Affine(
        child=Box(halfsides=(0.1, 1.0, 0.1)),
        orientation=(s, 0.0, 0.0, s),
        translation=(0.0, 0.0, 0.0),
    )
    d, _ = sdf_at(node, [[0.9, 0.0, 0.0], [0.0, 0.9, 0.0]])
    np.testing.assert_allclose(d, [-0.1, 0.8], atol=1e-12)


def test_union_is_min():
    node = Union(children=(Sphere(radius=0.5), Sphere(radius=1.0)))
    d, _ = sdf_at(node, [[2.0, 0.0, 0.0]])
    np.testing.assert_allclose(d, [1.0], atol=1e-15)


def test_smooth_union_bounds_min():
    node = SmoothUnion(
        children=(Sphere(radius=0.5), Torus(radius1=1.0, radius2=0.25)),
        blend_k=22.0,
    )
    hard = Union(children=(Sphere(radius=0.5), Torus(radius1=1.0, radius2=0.25)))
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (128, 3))
    d_soft, _ = sdf_at(node, pts)
    d_hard, _ = sdf_at(hard, pts)
    # logsumexp soft-min is a lower bound of the hard min, within log(n)/k.
    assert np.all(d_soft <= d_hard + 1e-12)
    assert np.all(d_soft >= d_hard - np.log(2) / 22.0 - 1e-12)


def test_smooth_union_matches_closed_form():
    node = SmoothUnion(children=(Sphere(radius=0.5), Sphere(radius=1.0)), blend_k=8.0)
    pts = np.asarray([[1.7, 0.3, -0.2]])
    d, _ = sdf_at(node, pts)
    r = np.linalg.norm(pts[0])
    d1, d2 = r - 0.5, r - 1.0
    want = -np.log(np.exp(-8 * d1) + np.exp(-8 * d2)) / 8
    np.testing.assert_allclose(d, [want], rtol=1e-12)


def test_onion_and_rounding():
    onion = Onion(child=Sphere(radius=1.0), radius=0.1)
    d, _ = sdf_at(onion, [[1.05, 0, 0], [1.5, 0, 0], [0.5, 0, 0]])
    np.testing.assert_allclose(d, [-0.05, 0.4, 0.4], atol=1e-15)

    rounded = Rounding(child=Sphere(radius=1.0), rounding=0.1)
    d, _ = sdf_at(rounded, [[1.05, 0, 0]])
    np.testing.assert_allclose(d, [-0.05], atol=1e-15)


def test_registry_scenes_compile_and_evaluate():
    for name in registry.available_scenes():
        node = registry.make_scene(name)
        sdf_vec, sdf_c, params = compile_scene(node, jnp.float64)
        pts = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, (4, 5, 3)))
        d = sdf_vec(params, pts)
        assert d.shape == (4, 5, 1)
        assert np.all(np.isfinite(np.asarray(d)))
        # componentwise and vector paths agree exactly
        d_c = sdf_c(params, pts[..., 0], pts[..., 1], pts[..., 2])
        np.testing.assert_array_equal(np.asarray(d)[..., 0], np.asarray(d_c))


def test_param_paths_test_scene():
    node = registry.make_scene("test_scene")
    paths = param_paths(init_params(node, jnp.float64))
    # SmoothUnion(blend_k) + 4 children with their leaves.
    assert "blend_k" in paths
    assert "c0/orientation" in paths and "c0/translation" in paths
    assert "c0/child/radius" in paths  # onion radius
    assert "c0/child/child/halfsides" in paths
    assert "c1/child/radius" in paths
    assert "c2/start" in paths and "c2/end" in paths and "c2/radius" in paths
    assert "c3/child/radius1" in paths and "c3/child/radius2" in paths
    assert "c1/orientation" in paths and "c3/translation" in paths
    assert len(paths) == 15


def test_every_leaf_is_differentiable():
    node = registry.make_scene("test_scene")
    sdf_vec, _, params = compile_scene(node, jnp.float64)
    pts = jnp.asarray(np.random.default_rng(2).uniform(-2, 2, (16, 3)))

    grads = jax.grad(lambda pp: jnp.sum(sdf_vec(pp, pts) ** 2))(params)
    flat = param_paths(grads)
    for path, g in flat.items():
        assert np.all(np.isfinite(np.asarray(g))), path
    # At least blend_k and some geometry leaves receive nonzero gradient.
    assert np.any(np.asarray(flat["blend_k"]) != 0)
    assert np.any(np.asarray(flat["c1/child/radius"]) != 0)


def test_union_gradient_routes_to_active_child():
    node = Union(children=(Sphere(radius=0.5), Sphere(radius=2.0)))
    sdf_vec, _, params = compile_scene(node, jnp.float64)
    p = jnp.asarray([[3.0, 0.0, 0.0]])
    grads = jax.grad(lambda pp: jnp.sum(sdf_vec(pp, p)))(params)
    # Second sphere is closer (d = 1.0 < 2.5): all gradient goes to it.
    assert np.asarray(grads["c0"]["radius"]) == 0.0
    assert np.asarray(grads["c1"]["radius"]) == -1.0


def test_union_pruning_compile():
    """compile_node(prune=True): the kernel-body union short-circuit
    (scene/graph.py round 5) — a 0/1-trip while-conditional appears in
    the pruned jaxpr (lax.cond is NOT used: Mosaic cannot legalize
    vector scf.if), values match the plain compile exactly, and the
    runtime bounding sphere is a valid lower bound (d >= |p-c| - R
    everywhere, sampled). The pruned form is FORWARD-ONLY by contract —
    no gradient comparison here; autodiff consumers get the plain
    compile (render/fast.py sdf pair)."""
    import jax

    from ray_marching_tpu.scene import registry
    from ray_marching_tpu.scene.graph import (
        bounding_sphere_fn,
        compile_node,
        init_params,
        subtree_leaf_count,
    )

    node = registry.make_scene("test_scene2")
    assert subtree_leaf_count(node) == 4  # room box + sphere/torus/line
    plain = compile_node(node)
    pruned = compile_node(node, prune=True)
    params = init_params(node, jnp.float64)

    rng = np.random.default_rng(0)
    x, y, z = (jnp.asarray(rng.uniform(-6, 6, (16, 128))) for _ in range(3))
    jaxpr_plain = str(jax.make_jaxpr(plain)(params, x, y, z))
    jaxpr_pruned = str(jax.make_jaxpr(pruned)(params, x, y, z))
    assert "while" not in jaxpr_plain
    assert "while" in jaxpr_pruned  # the interior-union skip compiled in
    # No cond PRIMITIVE (the "cond_jaxpr" of while mentions the word):
    assert "cond[" not in jaxpr_pruned  # Mosaic cannot lower vector scf.if

    np.testing.assert_allclose(
        np.asarray(plain(params, x, y, z)),
        np.asarray(pruned(params, x, y, z)), rtol=1e-14, atol=1e-15,
    )

    # Bound validity, sampled: interior subtree (child 1).
    interior = node.children[1]
    sdf_i = compile_node(interior)
    params_i = params["c1"]
    cx, cy, cz, R = bounding_sphere_fn(interior)(params_i)
    px = rng.uniform(-8, 8, (50000, 3))
    d = np.asarray(sdf_i(params_i, jnp.asarray(px[:, 0]),
                         jnp.asarray(px[:, 1]), jnp.asarray(px[:, 2])))
    lb = np.linalg.norm(
        px - np.array([float(cx), float(cy), float(cz)]), axis=1
    ) - float(R)
    assert (d - lb).min() > -1e-9


def test_union_pruning_affine_contracting_quaternion_safe():
    """A CONTRACTING quaternion (|q| < 1) shrinks an affine child's growth
    slope below 1, so no sphere-form lower bound is valid — the bound must
    disable itself (R = inf) and the pruned compile must still match the
    plain one on such params (the round-5 review caught a rescaled-radius
    version that skipped the true minimum child here)."""
    import jax

    from ray_marching_tpu.scene.graph import (
        Affine,
        Sphere,
        Torus,
        Union,
        bounding_sphere_fn,
        compile_node,
        init_params,
    )

    node = Union(children=(
        Sphere(radius=4.0),
        Affine(child=Union(children=(Sphere(radius=1.0),
                                     Torus(radius1=0.7, radius2=0.2))),
               orientation=(1.0, 0.0, 0.0, 0.0),
               translation=(0.0, 0.0, 0.0)),
    ))
    params = init_params(node, jnp.float64)
    # drive the affine quaternion INSIDE S^3 (contraction by ~0.72)
    params["c1"]["orientation"] = jnp.asarray([0.6, 0.6, 0.0, 0.0],
                                              jnp.float64)
    bfn = bounding_sphere_fn(node.children[1])
    assert bfn is not None
    _, _, _, R = bfn(params["c1"])
    assert np.isinf(float(R))  # bound disabled -> skip can never fire

    plain = compile_node(node)
    pruned = compile_node(node, prune=True)
    rng = np.random.default_rng(3)
    x, y, z = (jnp.asarray(rng.uniform(-12, 12, (8, 128)))
               for _ in range(3))
    np.testing.assert_allclose(
        np.asarray(plain(params, x, y, z)),
        np.asarray(pruned(params, x, y, z)), rtol=1e-14, atol=1e-15,
    )

    # unit quaternion: the bound engages again
    params["c1"]["orientation"] = jnp.asarray([1.0, 0.0, 0.0, 0.0],
                                              jnp.float64)
    _, _, _, R = bfn(params["c1"])
    assert np.isfinite(float(R))
