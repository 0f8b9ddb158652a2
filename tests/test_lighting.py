"""Extra lighting modes (render/lighting.py): ambient occlusion and
soft-shadowed directional lighting — unit behavior, fast↔modular parity,
sharded parity, and gradient health.

These are beyond-parity capabilities (the reference shader stack,
rendering/shader.py, has no light source); integer shader modes keep the
reference's mode % 8 semantics, the extras dispatch by name.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.render import lighting
from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import Affine, Plane, Sphere, Union, compile_scene

PX = 3.45e-6

IDENTITY = (1.0, 0.0, 0.0, 0.0)


def scalar(v):
    return jnp.asarray(v, jnp.float64)


def test_ambient_occlusion_open_ground_is_one():
    """On the x=0 plane with nothing nearby, every probe sees f == h
    exactly, so occlusion is exactly zero."""
    _, sdf_c, params = compile_scene(Plane(), jnp.float64)
    p = (scalar(0.0), scalar(0.3), scalar(-0.2))
    n = (scalar(1.0), scalar(0.0), scalar(0.0))
    ao = lighting.ambient_occlusion(sdf_c, params, p, n)
    assert float(ao) == 1.0


def test_ambient_occlusion_under_overhang_darkens():
    """A sphere hovering over the plane pulls the field below the probe
    heights → occlusion strictly below 1 (and within [0, 1])."""
    scene = Union(children=(
        Plane(),
        Affine(Sphere(radius=0.5), IDENTITY, (1.0, 0.0, 0.0)),
    ))
    _, sdf_c, params = compile_scene(scene, jnp.float64)
    p = (scalar(0.0), scalar(0.0), scalar(0.0))
    n = (scalar(1.0), scalar(0.0), scalar(0.0))
    ao = float(lighting.ambient_occlusion(sdf_c, params, p, n, step=0.1))
    assert 0.0 <= ao < 1.0
    # Far from the sphere the same ground point is fully open.
    p_far = (scalar(0.0), scalar(50.0), scalar(0.0))
    assert float(lighting.ambient_occlusion(sdf_c, params, p_far, n,
                                            step=0.1)) == 1.0


def test_soft_shadow_blocked_vs_open():
    scene = Affine(Sphere(radius=0.5), IDENTITY, (2.0, 0.0, 0.0))
    _, sdf_c, params = compile_scene(scene, jnp.float64)
    p = (scalar(0.0), scalar(0.0), scalar(0.0))
    n = (scalar(1.0), scalar(0.0), scalar(0.0))
    blocked = float(lighting.soft_shadow(sdf_c, params, p, n, (1.0, 0.0, 0.0)))
    open_ = float(lighting.soft_shadow(sdf_c, params, p, n, (0.0, 1.0, 0.0)))
    assert blocked == 0.0
    assert open_ == 1.0
    # Grazing past the edge: a genuine penumbra value, strictly between.
    graze = float(
        lighting.soft_shadow(sdf_c, params, p, n, (1.0, 0.29, 0.0))
    )
    assert 0.0 < graze < 1.0


def test_normalized_light_rejects_zero():
    with pytest.raises(ValueError):
        lighting.normalized_light((0.0, 0.0, 0.0))


def make_pair(scene="test_scene", w=64, h=48, steps=16):
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps,
    )
    node = registry.make_scene(scene)
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.3, -2.0]], jnp.float64)
    return r, f, q, t


@pytest.mark.parametrize("mode", lighting.EXTRA_MODES)
def test_extra_mode_fast_matches_modular(mode):
    """Both renderers share the componentwise lighting core, so they agree
    to roundoff (the same bar as the 8 reference modes)."""
    r, f, q, t = make_pair()
    a = np.asarray(r.render(r.init_params, q, t, mode=mode))
    b = np.asarray(f.render(f.init_params, q, t, mode=mode))
    assert np.isfinite(a).all()
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_shaded_gradients_finite_and_match():
    r, f, q, t = make_pair(steps=12)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((1, 48, 64, 3)))

    def loss(render):
        return lambda p: jnp.sum(render(p, q, t, mode="shaded") * w)

    g_mod = jax.grad(loss(lambda p, q, t, **kw: r.render(p, q, t, **kw)))(
        r.init_params
    )
    g_fast = jax.grad(loss(lambda p, q, t, **kw: f.render(p, q, t, **kw)))(
        f.init_params
    )
    def check(va, vb):
        assert np.isfinite(np.asarray(va)).all()
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-6, atol=1e-10)
        return va

    jax.tree.map(check, g_mod, g_fast)


def test_sharded_extra_mode_matches_single_device():
    from ray_marching_tpu.parallel import fast_sharding as fs
    from ray_marching_tpu.parallel.sharding import make_mesh

    cfg = RenderConfig(
        px_width=96, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 96, sensor_height=PX * 64,
        marching_steps=12,
    )
    node = registry.make_scene("test_scene")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True, row_multiple=64)
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.3, -2.0]], jnp.float64)
    a = np.asarray(f.render(f.init_params, q, t, mode="shaded"))
    render = fs.fast_shard_render(f, make_mesh((8,), ("rays",)),
                                  mode="shaded")
    b = np.asarray(render(f.init_params, q, t))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-11)


def test_cli_parses_extra_modes():
    from ray_marching_tpu.cli import _parse_mode

    assert _parse_mode("shaded") == "shaded"
    assert _parse_mode("occlusion") == "occlusion"
    assert _parse_mode("spin") == 7
    assert _parse_mode("3") == 3


# -- frozen regression fixture ------------------------------------------------
#
# The fast↔modular parity tests above pin the two renderers to each other;
# the frozen fixture (self-generated f64 by tools/gen_lighting_fixture.py —
# NOT a reference golden; the reference has no lighting) pins both against
# a committed artifact so they cannot drift together.


def _fixture():
    from pathlib import Path

    path = Path(__file__).parent / "fixtures" / "lighting_extra.npz"
    return np.load(path)


@pytest.mark.parametrize("mode", lighting.EXTRA_MODES)
def test_lighting_frozen_fixture_modular(mode):
    fx = _fixture()
    cfg = RenderConfig(
        px_width=int(fx["width"]), px_height=int(fx["height"]),
        focal_length=float(fx["px_size"]) * int(fx["height"]),
        sensor_width=float(fx["px_size"]) * int(fx["width"]),
        sensor_height=float(fx["px_size"]) * int(fx["height"]),
        marching_steps=int(fx["steps"]),
    )
    r = Renderer(registry.make_scene("test_scene"), cfg, dtype=jnp.float64,
                 grid_dtype=np.float64)
    q = jnp.asarray(fx["pose_q"], jnp.float64)
    t = jnp.asarray(fx["pose_t"], jnp.float64)
    img = np.asarray(r.jitted(mode=mode)(r.init_params, q, t))
    np.testing.assert_allclose(img, fx[mode], rtol=1e-12, atol=1e-13)
    assert img.std() > 0.01  # the fixture pose has real variation


@pytest.mark.parametrize("mode", lighting.EXTRA_MODES)
def test_lighting_frozen_fixture_fast(mode):
    fx = _fixture()
    cfg = RenderConfig(
        px_width=int(fx["width"]), px_height=int(fx["height"]),
        focal_length=float(fx["px_size"]) * int(fx["height"]),
        sensor_width=float(fx["px_size"]) * int(fx["width"]),
        sensor_height=float(fx["px_size"]) * int(fx["height"]),
        marching_steps=int(fx["steps"]),
    )
    f = FastRenderer(registry.make_scene("test_scene"), cfg,
                     dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray(fx["pose_q"], jnp.float64)
    t = jnp.asarray(fx["pose_t"], jnp.float64)
    img = np.asarray(f.jitted(mode=mode)(f.init_params, q, t))
    np.testing.assert_allclose(img, fx[mode], rtol=1e-9, atol=1e-10)


def test_render_all_modes_extras_bundle():
    """extras=True ships 10 images (8 reference + occlusion/shaded) from
    one march, on both renderers, matching the single-mode outputs."""
    r, f, q, t = make_pair(steps=12)
    import jax

    all_r = jax.jit(lambda p, q, t: r.render_all_modes(p, q, t, extras=True))(
        r.init_params, q, t
    )
    all_f = jax.jit(lambda p, q, t: f.render_all_modes(p, q, t, extras=True))(
        f.init_params, q, t
    )
    from ray_marching_tpu.render import shaders

    want = set(shaders.MODES) | set(lighting.EXTRA_MODES)
    assert set(all_r) == want and set(all_f) == want
    for mode in lighting.EXTRA_MODES:
        single = np.asarray(r.jitted(mode=mode)(r.init_params, q, t))
        np.testing.assert_allclose(np.asarray(all_r[mode]), single,
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(all_f[mode]), single,
                                   rtol=1e-9, atol=1e-10)
