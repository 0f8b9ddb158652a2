"""Marcher: convergence, mode equivalences, early exit, reflection."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.render.march import (
    march,
    march_planes,
    march_unrolled,
    reflect,
)
from ray_marching_tpu.scene.graph import Sphere, compile_scene


def sphere_setup(dtype=jnp.float64):
    sdf_vec, sdf_c, params = compile_scene(Sphere(radius=0.5), dtype)
    rng = np.random.default_rng(0)
    # Rays from z=-3 plane pointing +z towards the sphere.
    origins = np.zeros((64, 3))
    origins[:, 0] = rng.uniform(-0.3, 0.3, 64)
    origins[:, 1] = rng.uniform(-0.3, 0.3, 64)
    origins[:, 2] = -3.0
    dirs = np.zeros((64, 3))
    dirs[:, 2] = 1.0
    return sdf_vec, sdf_c, params, jnp.asarray(origins, dtype), jnp.asarray(dirs, dtype)


def test_march_converges_to_sphere_surface():
    sdf_vec, _, params, p0, v = sphere_setup()
    p = march(sdf_vec, params, p0, v, 64)
    d = np.asarray(sdf_vec(params, p))
    # All these rays hit the sphere (|xy| < 0.3 < 0.5): converge to |f|≈0.
    assert np.abs(d).max() < 1e-10
    np.testing.assert_allclose(np.linalg.norm(np.asarray(p), axis=-1), 0.5, atol=1e-10)


def test_scan_matches_unrolled():
    # scan (compiled) vs python unroll (eager): same math, but XLA fusion
    # may reassociate at the last bit — equality up to a few ulps.
    sdf_vec, _, params, p0, v = sphere_setup()
    a = np.asarray(march(sdf_vec, params, p0, v, 32))
    b = np.asarray(march_unrolled(sdf_vec, params, p0, v, 32))
    np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-15)


def test_remat_matches_plain_values_and_grads():
    sdf_vec, _, params, p0, v = sphere_setup()

    def loss(params, remat):
        p = march(sdf_vec, params, p0, v, 32, remat=remat)
        return jnp.sum(p**2)

    np.testing.assert_allclose(
        np.asarray(loss(params, False)), np.asarray(loss(params, True)),
        rtol=1e-13,
    )
    g0 = jax.grad(lambda pp: loss(pp, False))(params)
    g1 = jax.grad(lambda pp: loss(pp, True))(params)
    np.testing.assert_allclose(
        np.asarray(g0["radius"]), np.asarray(g1["radius"]), rtol=1e-12
    )


def test_early_exit_matches_unmasked_at_convergence():
    sdf_vec, _, params, p0, v = sphere_setup()
    exact = march(sdf_vec, params, p0, v, 64, tau=0.0)
    masked = march(sdf_vec, params, p0, v, 64, tau=1e-7)
    # Frozen rays stop within tau of the surface: same limit within tau.
    np.testing.assert_allclose(np.asarray(exact), np.asarray(masked), atol=1e-6)


def test_march_planes_matches_vector_march():
    sdf_vec, sdf_c, params, p0, v = sphere_setup()
    want = np.asarray(march(sdf_vec, params, p0, v, 32))
    x, y, z = march_planes(
        sdf_c, params,
        p0[:, 0], p0[:, 1], p0[:, 2],
        v[:, 0], v[:, 1], v[:, 2], 32,
    )
    got = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_reflect_formula():
    v = jnp.asarray([[0.0, -np.sqrt(0.5), np.sqrt(0.5)]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(reflect(v, n))
    np.testing.assert_allclose(out, [[0.0, np.sqrt(0.5), np.sqrt(0.5)]], atol=1e-12)
    # Reflection preserves norm and flips the normal component.
    rng = np.random.default_rng(1)
    v = rng.standard_normal((32, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    n = rng.standard_normal((32, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    r = np.asarray(reflect(jnp.asarray(v), jnp.asarray(n)))
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, rtol=1e-12)
    np.testing.assert_allclose(
        (r * n).sum(-1), -(v * n).sum(-1), rtol=1e-9, atol=1e-12
    )


def test_march_is_differentiable_wrt_radius():
    sdf_vec, _, params, p0, v = sphere_setup()

    def depth(params):
        p = march(sdf_vec, params, p0, v, 64)
        return jnp.mean(jnp.linalg.norm(p - p0, axis=-1))

    g = jax.grad(depth)(params)["radius"]
    # Growing the sphere brings the surface closer: d(depth)/d(radius) is
    # -1/cos(obliquity) per ray, so the mean sits in (-2, -1).
    assert -2.0 < float(g) < -0.9
