"""Normals estimator: tetrahedral FD vs autodiff, Laplacian sign/scale."""

import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.render.normals import NormalsEstimator, autodiff_normals
from ray_marching_tpu.scene.graph import Sphere, Torus, compile_scene


def test_sphere_normals_are_radial():
    sdf_vec, _, params = compile_scene(Sphere(radius=0.5), jnp.float64)
    est = NormalsEstimator(1e-6, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((128, 3))
    pts = 0.5 * pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    n, lap = est(sdf_vec, params, jnp.asarray(pts))
    # Tetrahedral FD error is O(eps · curvature) = O(eps · 2/r).
    np.testing.assert_allclose(np.asarray(n), pts / 0.5, atol=1e-5)


def test_matches_autodiff_normals():
    sdf_vec, _, params = compile_scene(Torus(radius1=1.0, radius2=0.25), jnp.float64)
    est = NormalsEstimator(1e-5, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-2, 2, (256, 3)))
    n_fd, _ = est(sdf_vec, params, pts)
    n_ad = autodiff_normals(sdf_vec, params, pts)
    np.testing.assert_allclose(np.asarray(n_fd), np.asarray(n_ad), atol=1e-4)


def test_laplacian_is_negated_laplacian_of_sdf():
    """The reference formula (f(p) − mean f(p+εvᵢ))·6/ε² estimates −Δf.

    For a sphere SDF f = |p| − r, Δf = 2/|p|, so the estimator returns
    ≈ −2/|p| (reference: rendering/ray_marching.py:120-124).
    """
    sdf_vec, _, params = compile_scene(Sphere(radius=0.5), jnp.float64)
    est = NormalsEstimator(1e-4, dtype=jnp.float64)
    pts = np.asarray([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0], [1.0, 1.0, 1.0]])
    _, lap = est(sdf_vec, params, jnp.asarray(pts))
    want = -2.0 / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lap), want, rtol=1e-5)


def test_offsets_geometry():
    est = NormalsEstimator(5e-2, dtype=jnp.float64)
    offs = np.asarray(est.offsets)
    # Four unit-scaled offsets of norm eps that sum to zero.
    np.testing.assert_allclose(np.linalg.norm(offs, axis=-1), 5e-2, rtol=1e-12)
    np.testing.assert_allclose(offs.sum(0), 0.0, atol=1e-17)
    # inverse actually inverts the relative-offset matrix
    rel = offs[1:4] - offs[0:1]
    np.testing.assert_allclose(
        rel @ np.asarray(est.offsets_inverse), np.eye(3), atol=1e-12
    )
