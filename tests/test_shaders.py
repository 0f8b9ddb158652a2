"""Shader stack: closed-form behaviors and colourmap gather semantics."""

import math

import jax.numpy as jnp
import numpy as np

from ray_marching_tpu import quat
from ray_marching_tpu.render import shaders


def test_lambertian_clamps_and_signs():
    v = jnp.asarray([[[[0.0, 0.0, 1.0]]]])
    n_facing = jnp.asarray([[[[0.0, 0.0, -1.0]]]])
    n_away = jnp.asarray([[[[0.0, 0.0, 1.0]]]])
    assert float(shaders.lambertian(v, n_facing)[0, 0, 0, 0]) == 1.0
    assert float(shaders.lambertian(v, n_away)[0, 0, 0, 0]) == 0.0


def test_distance_normalization_and_gamma():
    px = jnp.zeros((1, 1, 3, 3))
    surf = jnp.asarray([[[[1.0, 0, 0], [2.0, 0, 0], [4.0, 0, 0]]]])
    img = np.asarray(shaders.distance(px, surf))[0, 0, :, 0]
    # log distances: 0, log2, log4 -> normalized 0, 0.5, 1 -> gamma
    np.testing.assert_allclose(img, [0.0, 0.5 ** (1 / 2.33), 1.0], rtol=1e-12)


def test_proximity_clamps_negative_distances():
    d = jnp.asarray([[[[-0.5], [1e-2], [1.0]]]])
    img = np.asarray(shaders.proximity(d))
    # -0.5 clamps to 1e-2 (same log as the second) -> both 0 after min-max.
    assert img[0, 0, 0, 0] == 0.0 and img[0, 0, 1, 0] == 0.0
    assert img[0, 0, 2, 0] == 1.0


def test_vignette_is_cos_cubed():
    frames = jnp.eye(3)[None]
    v = jnp.asarray([[[[0.0, 0.0, 1.0], [0.0, np.sqrt(0.5), np.sqrt(0.5)]]]])
    img = np.asarray(shaders.vignette(v, frames))
    np.testing.assert_allclose(img[0, 0, :, 0], [1.0, 0.5**1.5], rtol=1e-6)


def test_laplacian_mapping():
    lap = jnp.asarray([[[[2.0], [-2.0], [0.0]]]])
    img = np.asarray(shaders.laplacian(lap))[0, 0, :, 0]
    np.testing.assert_allclose(img, [0.0, 1.0, 0.5 ** (1 / 2.33)], rtol=1e-12)


def test_angle_colouring_gather_indexing():
    cmap = shaders.load_cyclic_cmap(jnp.float64)
    k = cmap.shape[0]
    # angle 0 -> index floor(0.5 * degree * k) mod k
    re = jnp.asarray([1.0])
    im = jnp.asarray([0.0])
    got = np.asarray(shaders.angle_colouring(re, im, cmap, degree=1))
    np.testing.assert_array_equal(got[0], np.asarray(cmap)[k // 2])
    # degree=2 doubles the winding: angle 0 -> row 0 (wraps k mod k).
    got2 = np.asarray(shaders.angle_colouring(re, im, cmap, degree=2))
    np.testing.assert_array_equal(got2[0], np.asarray(cmap)[0])
    # negative angles map into [0, k) via the remainder.
    got3 = np.asarray(
        shaders.angle_colouring(jnp.asarray([0.0]), jnp.asarray([-1.0]), cmap, 1)
    )
    np.testing.assert_array_equal(got3[0], np.asarray(cmap)[k // 4])


def test_domain_colouring_brightness_is_modulus():
    cmap = jnp.ones((4096, 3), jnp.float64)
    re, im = jnp.asarray([3.0]), jnp.asarray([4.0])
    got = np.asarray(shaders.domain_colouring(re, im, cmap, 1))
    np.testing.assert_allclose(got, [[5.0, 5.0, 5.0]], rtol=1e-12)


def test_spin_argument_swap_is_replicated():
    """The reference passes (im, re) into domain colouring's (re, im) slots
    (shader.py:171); verify our spin output reflects the swap."""
    cmap = shaders.load_cyclic_cmap(jnp.float64)
    n = jnp.asarray([[[[0.0, 0.0, 1.0]]]])
    q_conj = jnp.asarray([[[[1.0, 0.0, 0.0, 0.0]]]])
    # value = (0,0,0,1): a=0, |bcd|=1 -> re_slot gets im=0, im_slot gets re=-1
    # -> atan2(-1, 0) = -pi/2 -> fraction 0.25 of the colour circle.
    got = np.asarray(shaders.spin(q_conj, n, cmap, degree=1))
    k = cmap.shape[0]
    want_row = np.asarray(cmap)[int((0.25 * k)) % k]
    np.testing.assert_allclose(got[0, 0, 0], want_row, rtol=1e-12)


def test_shade_mode_wraparound():
    kwargs = dict(
        px_coords=jnp.zeros((1, 2, 2, 3)),
        camera_orientation=jnp.asarray([[1.0, 0, 0, 0]]),
        pixel_frames=jnp.eye(3)[None],
        ray_directions=jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 2, 3))),
        surface_coords=jnp.asarray(np.random.default_rng(1).standard_normal((1, 2, 2, 3))),
        surface_normals=jnp.asarray(np.random.default_rng(2).standard_normal((1, 2, 2, 3))),
        surface_laplacian=jnp.ones((1, 2, 2, 1)),
        surface_distances=jnp.ones((1, 2, 2, 1)),
        cyclic_cmap=shaders.load_cyclic_cmap(jnp.float64),
        degree=1,
    )
    a = shaders.shade(0, **kwargs)
    b = shaders.shade(8, **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shade_all_has_all_modes():
    kwargs = dict(
        px_coords=jnp.zeros((1, 2, 2, 3)),
        camera_orientation=jnp.asarray([[1.0, 0, 0, 0]]),
        pixel_frames=jnp.eye(3)[None],
        ray_directions=jnp.ones((1, 2, 2, 3)) / np.sqrt(3),
        surface_coords=jnp.ones((1, 2, 2, 3)),
        surface_normals=jnp.ones((1, 2, 2, 3)) / np.sqrt(3),
        surface_laplacian=jnp.ones((1, 2, 2, 1)),
        surface_distances=jnp.ones((1, 2, 2, 1)),
        cyclic_cmap=shaders.load_cyclic_cmap(jnp.float64),
        degree=2,
    )
    out = shaders.shade_all(**kwargs)
    assert set(out) == set(shaders.MODES)
