"""Shader stack: closed-form behaviors and colourmap gather semantics."""

import math

import jax

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


# -- gather-free Fourier colourmap ------------------------------------------


def test_fourier_cmap_matches_table_at_bin_centres():
    """The 8-harmonic fit reproduces every table row to < 1e-3 (0.26/255)."""
    cmap = np.asarray(shaders.load_cyclic_cmap(jnp.float64))
    coeffs = shaders.fourier_cmap_coeffs()
    k = cmap.shape[0]
    # Bin centre i+0.5 ↔ complex direction of angle (i+0.5)·2π/k − π.
    ang = (np.arange(k) + 0.5) * (2 * np.pi / k) - np.pi
    re = jnp.asarray(np.cos(ang))
    im = jnp.asarray(np.sin(ang))
    cols = shaders.angle_colouring_fourier(re, im, coeffs, 1)
    got = np.stack([np.asarray(c) for c in cols], axis=-1)
    assert np.abs(got - cmap).max() < 1e-3


def test_fourier_matches_gather_random_angles():
    """At random angles and degrees the continuous evaluation stays within
    table quantization + fit error of the exact gather."""
    cmap = shaders.load_cyclic_cmap(jnp.float64)
    coeffs = shaders.fourier_cmap_coeffs()
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((64,)))
    im = jnp.asarray(rng.standard_normal((64,)))
    for degree in (1, 2, 3):
        exact = np.asarray(shaders.angle_colouring(re, im, cmap, degree))
        four = np.stack(
            [
                np.asarray(c)
                for c in shaders.angle_colouring_fourier(re, im, coeffs, degree)
            ],
            axis=-1,
        )
        # In-bin slope of the map bounds the floor-vs-continuous gap.
        assert np.abs(exact - four).max() < 4e-3 * degree


def test_fourier_zero_modulus_matches_gather():
    """atan2(0, 0) = 0 in the gather path; the Fourier path must agree."""
    cmap = shaders.load_cyclic_cmap(jnp.float64)
    coeffs = shaders.fourier_cmap_coeffs()
    z = jnp.zeros((1,))
    for degree in (1, 2):
        exact = np.asarray(shaders.angle_colouring(z, z, cmap, degree))[0]
        four = np.stack(
            [np.asarray(c) for c in shaders.angle_colouring_fourier(z, z, coeffs, degree)],
            axis=-1,
        )[0]
        np.testing.assert_allclose(four, exact, atol=2e-3)


def test_fourier_is_differentiable_in_angle():
    """The exact gather is piecewise-constant (zero angle gradient); the
    Fourier evaluation carries a real gradient — finite and generically
    nonzero."""
    coeffs = shaders.fourier_cmap_coeffs()

    def f(re, im):
        cols = shaders.angle_colouring_fourier(re, im, coeffs, 1)
        return sum(jnp.sum(c) for c in cols)

    g = jax.grad(f, argnums=(0, 1))(jnp.asarray([0.3]), jnp.asarray([0.8]))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert any(np.abs(np.asarray(x)).max() > 1e-3 for x in g)
