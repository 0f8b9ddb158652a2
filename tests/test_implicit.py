"""Implicit-function-theorem backward: parity with unrolled autodiff on
converged rays, and behavior at its documented limits."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.render.implicit import march_implicit
from ray_marching_tpu.render.march import march
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import Sphere, compile_scene, param_paths


def camera_rays(shape=(1, 24, 40), z=-3.0, spread=0.8, dtype=jnp.float64):
    rng = np.random.default_rng(3)
    p0 = np.zeros(shape + (3,))
    p0[..., 0] = rng.uniform(-spread, spread, shape)
    p0[..., 1] = rng.uniform(-spread, spread, shape)
    p0[..., 2] = z
    v = np.zeros(shape + (3,))
    v[..., 2] = 1.0
    return jnp.asarray(p0, dtype), jnp.asarray(v, dtype)


def test_forward_identical_to_scan():
    sdf_vec, _, params = compile_scene(registry.make_scene("composite"), jnp.float64)
    p0, v = camera_rays()
    a = march(sdf_vec, params, p0, v, 32)
    b = march_implicit(sdf_vec, params, p0, v, 32, 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradients_match_unrolled_on_converged_rays():
    """With the loss restricted to tightly-converged rays, IFT gradients
    equal unrolled autodiff to ~1e-4 relative (they coincide at the exact
    fixed point)."""
    sdf_vec, _, params = compile_scene(registry.make_scene("composite"), jnp.float64)
    p0, v = camera_rays()
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(p0.shape))
    p = march(sdf_vec, params, p0, v, 200)
    hit = jnp.asarray(np.abs(np.asarray(sdf_vec(params, p))) < 1e-6)
    wm = w * hit

    g1 = param_paths(
        jax.grad(lambda pp: jnp.sum(march(sdf_vec, pp, p0, v, 200) * wm))(params)
    )
    g2 = param_paths(
        jax.grad(
            lambda pp: jnp.sum(march_implicit(sdf_vec, pp, p0, v, 200, 0.0) * wm)
        )(params)
    )
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = max(np.abs(a).max(), 1e-9)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=k)


def test_sphere_depth_gradient_closed_form():
    """Head-on ray into a sphere: d(depth)/d(radius) = -1 exactly; IFT
    recovers it from a single endpoint VJP."""
    sdf_vec, _, params = compile_scene(Sphere(radius=0.5), jnp.float64)
    p0 = jnp.asarray([[0.0, 0.0, -3.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])

    def depth(params):
        p = march_implicit(sdf_vec, params, p0, v, 64, 0.0)
        return jnp.sum((p - p0) * v)

    g = float(jax.grad(depth)(params)["radius"])
    np.testing.assert_allclose(g, -1.0, rtol=1e-8)


def test_miss_rays_get_zero_param_gradients():
    sdf_vec, _, params = compile_scene(Sphere(radius=0.5), jnp.float64)
    # Rays that miss the sphere entirely (offset 2 > radius).
    p0 = jnp.asarray([[2.0, 0.0, -3.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    g = jax.grad(
        lambda pp: jnp.sum(march_implicit(sdf_vec, pp, p0, v, 16, 0.0))
    )(params)
    assert float(g["radius"]) == 0.0


def test_pipeline_backward_implicit_runs():
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig

    px = 3.45e-6
    cfg = RenderConfig(
        px_width=48, px_height=32,
        focal_length=px * 32, sensor_width=px * 48, sensor_height=px * 32,
        marching_steps=16, backward="implicit",
    )
    r = Renderer(registry.make_scene("test_scene2"), cfg, dtype=jnp.float32)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float32)

    def loss(params):
        return jnp.mean(r.render(params, q, t, mode=0, degree=1) ** 2)

    val, grads = jax.value_and_grad(loss)(r.init_params)
    assert np.isfinite(float(val))
    flat = param_paths(grads)
    assert all(np.isfinite(np.asarray(v)).all() for v in flat.values())


def test_ift_knobs_configurable_via_render_config():
    """ift_hit_threshold / ift_denom_eps flow from RenderConfig into both
    the modular and fused IFT backwards (round 1 hardcoded them). Tested at
    the march boundary (p* is smooth in params; the shaders' min/max
    normalizations have pow-at-0 singularities at the arg-extremum pixel
    that would mask the gating): a negative hit threshold classifies every
    ray as a miss (rays can converge to exactly |f| = 0 in f64, so no
    positive threshold excludes them all) -> exactly zero scene-parameter
    gradients; widening denom_eps rescales grazing-ray gradients."""
    import dataclasses

    from ray_marching_tpu.render.fast import FastRenderer
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig

    PX = 3.45e-6
    base = RenderConfig(
        px_width=48, px_height=32,
        focal_length=PX * 32, sensor_width=PX * 48, sensor_height=PX * 32,
        marching_steps=24, backward="implicit",
    )
    node = registry.make_scene("test_scene2")
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float64)
    rng = np.random.default_rng(7)
    w_img = jnp.asarray(rng.standard_normal((1, 32, 48, 3)))

    def modular_grads(cfg):
        r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
        _, _, ray_pos, ray_dirs = r.camera.pose(q, t)

        def loss(p):
            p_star, _ = r._march(p, ray_pos, ray_dirs, cfg.marching_steps)
            return jnp.sum(p_star * w_img)

        return param_paths(jax.grad(loss)(r.init_params))

    def fast_grads(cfg):
        f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                         interpret=True)
        origin, dirs = f._pose_planes(q, t)

        def loss(p):
            hit, _ = f._march_planes(p, origin, dirs, cfg.marching_steps)
            # endpoint planes only (x, y, z), masked to real rays
            return sum(jnp.sum(hit[i] * f._valid) for i in range(3))

        return param_paths(jax.grad(loss)(f.init_params))

    for grads in (modular_grads, fast_grads):
        g_default = grads(base)
        assert any(np.abs(np.asarray(v)).max() > 0 for v in g_default.values())
        assert all(np.isfinite(np.asarray(v)).all() for v in g_default.values())
        # Nothing counts as a hit -> zero parameter gradients everywhere.
        g_none = grads(dataclasses.replace(base, ift_hit_threshold=-1.0))
        assert all(np.abs(np.asarray(v)).max() == 0 for v in g_none.values())
        # Grazing-ray sensitivity: a huge denom_eps rescales the gradients.
        g_wide = grads(dataclasses.replace(base, ift_denom_eps=10.0))
        assert any(
            not np.allclose(np.asarray(g_default[k]), np.asarray(g_wide[k]))
            for k in g_default
        )


def test_fast_implicit_coverage_matches_modular():
    """The fused argmin-frozen coverage backward
    (ops.pallas_render.fused_march_normals_cov_ift) is pinned to the
    modular march_with_closest_implicit routing: same forward pixels/alpha,
    same gradients."""
    from ray_marching_tpu.render.fast import FastRenderer
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig

    px = 3.45e-6
    cfg = RenderConfig(
        px_width=64, px_height=48,
        focal_length=px * 48, sensor_width=px * 64, sensor_height=px * 48,
        marching_steps=12, backward="implicit",
    )
    node = registry.make_scene("test_scene2")
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    rng = np.random.default_rng(5)
    wi = jnp.asarray(rng.standard_normal((1, 48, 64, 3)))
    wa = jnp.asarray(rng.standard_normal((1, 48, 64, 1)))

    ia, aa = r.render_with_alpha(r.init_params, q, t, mode=0, degree=2)
    ib, ab = f.render_with_alpha(f.init_params, q, t, mode=0, degree=2)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib),
                               rtol=1e-9, atol=1e-11, equal_nan=True)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ab),
                               rtol=1e-9, atol=1e-11)

    def loss(render_fn, params):
        img, alpha = render_fn(params, q, t, mode=0, degree=2)
        return jnp.sum(img * wi) + jnp.sum(alpha * wa)

    g1 = param_paths(jax.grad(lambda p: loss(r.render_with_alpha, p))(r.init_params))
    g2 = param_paths(jax.grad(lambda p: loss(f.render_with_alpha, p))(f.init_params))
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-6, atol=1e-10,
            err_msg=k,
        )
