"""Reflection bounces (BASELINE config 3): physical correctness + pipeline.

The reference defines the mirror formula but never calls it
(control.py:179-194); here bounces are a first-class marcher feature, so
these tests pin the semantics: after hitting a mirror the ray continues in
the reflected direction and shades what it hits *there*.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import Affine, Plane, Sphere, Union

PX = 3.45e-6


def make_renderer(scene, w=64, h=48, steps=48, bounces=0, eps=1e-3):
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps, reflection_bounces=bounces, normals_eps=eps,
    )
    return Renderer(scene, cfg, dtype=jnp.float64, grid_dtype=np.float64)


def test_mirror_plane_sees_sphere_behind_camera():
    """Camera faces a mirror (the x=0 plane rotated to face +z); a sphere
    sits behind the camera. With one bounce the reflected rays must hit the
    sphere: the bounced proximity at the image centre is the sphere hit."""
    # Plane normal +x by construction; rotate so it becomes z = -3 facing +z:
    # rotate x-axis -> z-axis via 90° about y, then translate.
    s = np.sqrt(0.5)
    mirror = Affine(
        child=Plane(),
        orientation=(s, 0.0, -s, 0.0),  # maps local x-axis to world z-axis
        translation=(0.0, 0.0, -3.0),
    )
    sphere = Sphere(radius=0.5)  # at origin — behind the camera at z=-1.5
    scene = Union(children=(mirror, sphere))

    r = make_renderer(scene, bounces=1)
    # Camera at z=-1.5 looking towards the mirror (-z).
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.0, -1.5]], jnp.float64)

    pixel_pos, frames, ray_pos, ray_dirs = r.camera.pose(q, t)
    p, v = r._march(r.init_params, ray_pos, ray_dirs, 48)
    centre = np.asarray(p)[0, 24, 32]
    # Reflected central ray: mirror at z=-3 sends it back +z to the sphere
    # front face at z ≈ -0.5 (radius 0.5, hit from -z side).
    # (The centre pixel sits half a pixel off the optical axis, so allow a
    # small transverse offset.)
    np.testing.assert_allclose(centre[2], -0.5, atol=2e-2)
    np.testing.assert_allclose(centre[:2], 0.0, atol=6e-2)
    # And the final direction is the reflected one (+z).
    v_centre = np.asarray(v)[0, 24, 32]
    np.testing.assert_allclose(v_centre[2], 1.0, atol=2e-2)


def test_zero_bounces_unchanged_by_flag_path():
    scene = registry.make_scene("test_scene2")
    r0 = make_renderer(scene, bounces=0)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float64)
    a = r0.render(r0.init_params, q, t, mode=0, degree=1)
    # An independent renderer with the same config gives identical pixels.
    b = make_renderer(scene, bounces=0).render(r0.init_params, q, t, mode=0, degree=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_scene_all_modes_one_bounce():
    """BASELINE config 3 shape: registry scene, every shader, 1 bounce."""
    scene = registry.make_scene("test_scene2")
    r = make_renderer(scene, bounces=1, steps=24)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float64)
    images = r.render_all_modes(r.init_params, q, t, degree=2)
    assert set(images) == {
        "lambertian", "distance", "proximity", "vignette",
        "normal", "laplacian", "tangent", "spin",
    }
    for name, img in images.items():
        assert img.shape == (1, 48, 64, 3)
        if name != "proximity":  # proximity can be all-NaN by reference 0/0
            assert np.isfinite(np.asarray(img)).all(), name


def test_bounce_gradients_flow():
    scene = registry.make_scene("test_scene2")
    r = make_renderer(scene, bounces=1, steps=16)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float64)
    g = jax.grad(
        lambda p: jnp.sum(r.render(p, q, t, mode=0, degree=1) ** 2)
    )(r.init_params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)
