"""Custom-node registration API (graph.register_custom_node) and the
Mandelbulb fractal leaf (scene/fractals.py).

The registration door is the extensibility contract: a third-party SDF leaf
must compile, init its params, render on BOTH pipelines, train, and
round-trip through scene JSON — exercised here with a minimal in-test
Ellipsoid and with the in-tree Mandelbulb.
"""

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.fractals import (
    Mandelbulb,
    _ipow,
    _unit_complex_ipow,
    mandelbulb_sdf,
    init_mandelbulb_params,
)
from ray_marching_tpu.scene.graph import (
    Node,
    Union,
    compile_scene,
    register_custom_node,
)
from ray_marching_tpu.scene.serialize import node_from_dict, node_to_dict


@dataclass(frozen=True)
class Ellipsoid(Node):
    """Minimal third-party leaf: bound-estimate ellipsoid SDF."""

    radii: Tuple[float, float, float] = (1.0, 0.5, 0.25)


def _ellipsoid_sdf(node):
    def evaluate(params, x, y, z):
        rx, ry, rz = params["radii"][0], params["radii"][1], params["radii"][2]
        k0 = jnp.sqrt((x / rx) ** 2 + (y / ry) ** 2 + (z / rz) ** 2)
        k1 = jnp.sqrt((x / rx**2) ** 2 + (y / ry**2) ** 2 + (z / rz**2) ** 2)
        k1 = jnp.where(k1 < 1e-12, 1e-12, k1)
        return k0 * (k0 - 1.0) / k1

    return evaluate


def _ellipsoid_init(node, dtype):
    return {"radii": jnp.asarray(node.radii, dtype=dtype)}


register_custom_node(Ellipsoid, _ellipsoid_sdf, _ellipsoid_init)


def _cfg(w=64, h=48, steps=32, **kw):
    px = 3.45e-6
    return RenderConfig(
        px_width=w, px_height=h, focal_length=px * h,
        sensor_width=px * w, sensor_height=px * h, marching_steps=steps, **kw
    )


POSE = (
    jnp.asarray([[0.0, 0.0, 1.0, 0.0]]),
    jnp.asarray([[0.0, 0.0, 2.2]]),
)


def test_register_rejects_non_node():
    with pytest.raises(TypeError):
        register_custom_node(int, lambda n: None, lambda n, d: {})


def test_register_rejects_name_collisions():
    """Scene JSON is keyed by class name — shadowing a built-in or another
    registered custom class must fail loudly at registration time."""

    @dataclass(frozen=True)
    class Sphere(Node):  # shadows the built-in's name
        pass

    with pytest.raises(ValueError, match="collides"):
        register_custom_node(Sphere, lambda n: None, lambda n, d: {})

    @dataclass(frozen=True)
    class Ellipsoid(Node):  # same name as the module-level custom node
        pass

    with pytest.raises(ValueError, match="collides"):
        register_custom_node(Ellipsoid, lambda n: None, lambda n, d: {})
    # re-registering the SAME class is fine (idempotent)
    register_custom_node(
        globals()["Ellipsoid"], _ellipsoid_sdf, _ellipsoid_init
    )


def test_registered_subclass_compiles():
    """isinstance semantics: a subclass of a registered node type compiles
    through its base's entry (matches the pre-registry NeuralSDF
    dispatch)."""

    @dataclass(frozen=True)
    class SquashedEllipsoid(Ellipsoid):
        pass

    _, sdf_c, params = compile_scene(SquashedEllipsoid(radii=(1.0, 1.0, 1.0)))
    d = float(sdf_c(params, jnp.asarray(2.0), jnp.asarray(0.0), jnp.asarray(0.0)))
    assert d == pytest.approx(1.0, abs=1e-6)


def test_custom_leaf_compiles_and_evaluates():
    _, sdf_c, params = compile_scene(Ellipsoid())
    # On-axis distances of an axis-aligned ellipsoid are exact.
    assert float(sdf_c(params, jnp.asarray(2.0), jnp.asarray(0.0), jnp.asarray(0.0))) == pytest.approx(1.0, abs=1e-6)
    assert float(sdf_c(params, jnp.asarray(0.0), jnp.asarray(1.5), jnp.asarray(0.0))) == pytest.approx(1.0, abs=1e-6)
    assert float(sdf_c(params, jnp.asarray(0.5), jnp.asarray(0.0), jnp.asarray(0.0))) < 0.0


def test_custom_leaf_composes_and_params_train():
    """The leaf participates in CSG and its params take gradients."""
    scene = Union(children=(Ellipsoid(), registry.make_scene("single_sphere")))
    _, sdf_c, params = compile_scene(scene)

    def loss(p):
        return sdf_c(p, jnp.asarray(2.0), jnp.asarray(0.1), jnp.asarray(0.1))

    g = jax.grad(loss)(params)
    assert np.all(np.isfinite(np.asarray(g["c0"]["radii"])))
    assert np.any(np.asarray(g["c0"]["radii"]) != 0.0)


def test_custom_leaf_renders_both_pipelines():
    scene = Ellipsoid()
    q, t = POSE
    rm = Renderer(scene, _cfg(), dtype=jnp.float64)
    rf = FastRenderer(scene, _cfg(), dtype=jnp.float64)
    a = np.asarray(jax.jit(lambda: rm.render(rm.init_params, q, t, mode=0, degree=2))())
    b = np.asarray(jax.jit(lambda: rf.render(rf.init_params, q, t, mode=0, degree=2))())
    # Open scene: rays that miss the ellipsoid legitimately diverge, but
    # the object must dominate the frame with finite shading.
    assert np.isfinite(a).mean() > 0.5
    close = np.isclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)
    assert close.mean() > 0.99


def test_custom_leaf_serializes():
    scene = Union(children=(Ellipsoid(radii=(0.5, 0.25, 0.75)),))
    back = node_from_dict(node_to_dict(scene))
    assert back == scene


# ---------------------------------------------------------------------------
# Mandelbulb
# ---------------------------------------------------------------------------


def test_de_moivre_matches_trig():
    """Binary-exponentiation de Moivre == sin/cos(n·a) (the inverse-trig-free
    identity the Mosaic path depends on)."""
    a = jnp.linspace(-3.0, 3.0, 257, dtype=jnp.float64)
    for n in (2, 3, 7, 8):
        c, s = _unit_complex_ipow(jnp.cos(a), jnp.sin(a), n)
        np.testing.assert_allclose(np.asarray(c), np.cos(n * np.asarray(a)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(s), np.sin(n * np.asarray(a)), atol=1e-12)
    x = jnp.linspace(0.1, 1.9, 64, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(_ipow(x, 7)), np.asarray(x) ** 7, rtol=1e-13)


def test_mandelbulb_sign_structure():
    node = Mandelbulb(power=8, iterations=12)
    f = mandelbulb_sdf(node)
    p = init_mandelbulb_params(node, jnp.float64)
    inside = float(f(p, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0)))
    near = float(f(p, jnp.asarray(0.5), jnp.asarray(0.0), jnp.asarray(0.0)))
    far = float(f(p, jnp.asarray(2.5), jnp.asarray(0.0), jnp.asarray(0.0)))
    assert inside <= 0.0
    assert near < 0.0  # 0.5 on the x-axis is inside the bulb
    assert 0.5 < far < 2.0  # underestimating distance, roughly |p| - 1.2


def test_mandelbulb_de_underestimates():
    """Sphere-tracing safety: stepping by f(p) from outside must not cross
    the surface (f stays >= 0 along the ray until convergence). Rays start
    at radius 6 to exercise the FAR field, where the raw potential estimate
    0.5·r·ln(r) overshoots and the r − set_radius bound must bind."""
    node = Mandelbulb(power=8, iterations=12)
    f = mandelbulb_sdf(node)
    p = init_mandelbulb_params(node, jnp.float64)
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pos = jnp.asarray(-6.0 * dirs)  # start far outside, aim at the origin
    v = jnp.asarray(dirs)
    for _ in range(96):
        d = f(p, pos[:, 0], pos[:, 1], pos[:, 2])
        # The estimator may overshoot by ~1e-5 near the fractal boundary
        # (finite iterations; the 0.5 potential factor is the usual safety
        # margin, not a guarantee) — what must never happen is a deep
        # punch-through.
        assert np.asarray(d).min() > -1e-3, "marched through the surface"
        pos = pos + d[:, None] * v
    # most rays aimed at the bulb centre should be closing on the surface
    # (the DE underestimates heavily near the fractal boundary, so
    # convergence is slow — safety, not speed, is the contract here)
    d_end = np.asarray(f(p, pos[:, 0], pos[:, 1], pos[:, 2]))
    assert (np.abs(d_end) < 1e-2).mean() > 0.95


def test_mandelbulb_gradient_finite_on_axis_and_origin():
    """The sqrt guards must act BEFORE the sqrt: on-axis and origin
    evaluations (e.g. pad-slot rays marching down an unrotated bulb's axis)
    previously produced NaN backward through sqrt(0)'s VJP."""
    node = Mandelbulb(power=8, iterations=8)
    f = mandelbulb_sdf(node)
    p = init_mandelbulb_params(node, jnp.float64)
    for pt in [(0.0, 0.0, 1.5), (0.0, 0.0, 2.2), (0.0, 0.0, 0.0),
               (0.0, 1.7, 0.0), (0.0, 0.0, -0.9)]:
        g = jax.grad(lambda pp: f(pp, *map(jnp.asarray, pt)))(p)
        assert np.isfinite(float(g["scale"])), f"NaN gradient at {pt}"


def test_mandelbulb_far_field_is_bounded_underestimate():
    """Beyond the bailout sphere the DE must be positive, below the true
    distance (set inside |p| <= 2^(1/7)), and big enough to make progress."""
    node = Mandelbulb(power=8, iterations=12)
    f = mandelbulb_sdf(node)
    p = init_mandelbulb_params(node, jnp.float64)
    set_radius = 2.0 ** (1.0 / 7.0)
    for r in (2.5, 5.0, 10.0, 100.0):
        d = float(f(p, jnp.asarray(r), jnp.asarray(0.0), jnp.asarray(0.0)))
        # safe: never beyond the bound (set reaches radius ~1.0 on +x)
        assert 0.0 < d <= r - 1.0 + 1e-9, f"overshoot at r={r}: d={d}"
        # useful: at least a constant fraction of the sphere-bound step
        assert d >= 0.4 * (r - set_radius), f"stalled at r={r}: d={d}"


def test_mandelbulb_scale_gradient():
    node = Mandelbulb(power=8, iterations=8)
    f = mandelbulb_sdf(node)
    p = init_mandelbulb_params(node, jnp.float64)

    def at(pp, s=2.0):
        return f(pp, jnp.asarray(s), jnp.asarray(0.3), jnp.asarray(0.1))

    g = float(jax.grad(at)(p)["scale"])
    # scaling the bulb up moves the surface toward an outside point
    assert np.isfinite(g) and g < 0.0
    # finite-difference agreement (outside points are smooth in scale)
    eps = 1e-6
    fd = (float(at({"scale": jnp.asarray(1.0 + eps, jnp.float64)}))
          - float(at({"scale": jnp.asarray(1.0 - eps, jnp.float64)}))) / (2 * eps)
    assert g == pytest.approx(fd, rel=1e-4)


@pytest.mark.slow
def test_mandelbulb_scene_parity_fast_vs_modular():
    """Fast (interpret Pallas kernel) vs modular pixels on the registry
    scene. The fractal boundary is chaotic — grazing rays legitimately
    diverge between any two fp evaluation orders (CLAUDE.md stability
    rule), so assert a high agree fraction, not allclose."""
    scene = registry.make_scene("mandelbulb")
    q, t = POSE
    cfg = _cfg(w=96, h=64, steps=48)
    rm = Renderer(scene, cfg, dtype=jnp.float64)
    rf = FastRenderer(scene, cfg, dtype=jnp.float64)
    a = np.asarray(jax.jit(lambda: rm.render(rm.init_params, q, t, mode=0, degree=2))())
    b = np.asarray(jax.jit(lambda: rf.render(rf.init_params, q, t, mode=0, degree=2))())
    assert np.isfinite(a).all()
    close = np.isclose(a, b, rtol=1e-9, atol=1e-11)
    assert close.mean() > 0.98


@pytest.mark.slow
def test_mandelbulb_render_gradient_finite():
    scene = registry.make_scene("mandelbulb")
    q, t = POSE
    rm = Renderer(scene, _cfg(steps=24), dtype=jnp.float64)

    def loss(p):
        return jnp.mean(rm.render(p, q, t, mode=0, degree=2))

    g = jax.jit(jax.grad(loss))(rm.init_params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


@pytest.mark.slow
def test_mandelbulb_scale_trains_by_inverse_rendering():
    """The custom leaf's parameter actually optimizes through the renderer:
    recover the bulb's scale from a target image. The fractal loss surface
    is noisy (chaotic silhouettes), so assert the error at least halves."""
    import optax

    cfg = _cfg(w=48, h=32, steps=24)
    scene = registry.make_scene("mandelbulb")
    r = Renderer(scene, cfg, dtype=jnp.float64)
    q, t = POSE
    target = jax.jit(lambda p: r.render(p, q, t, mode=0, degree=2))(r.init_params)

    p = jax.tree.map(lambda a: a, r.init_params)
    p["c1"]["child"]["scale"] = jnp.asarray(0.85, jnp.float64)

    def loss_fn(p):
        img = r.render(p, q, t, mode=0, degree=2)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(p)

    @jax.jit
    def step(p, state):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, state = opt.update(g, state, p)
        return optax.apply_updates(p, updates), state, loss

    for _ in range(60):
        p, state, loss = step(p, state)
    err = abs(float(p["c1"]["child"]["scale"]) - 1.0)
    assert err < 0.075, f"scale error {err} did not halve from 0.15"


def test_mandelbulb_serializes():
    scene = registry.make_scene("mandelbulb")
    back = node_from_dict(node_to_dict(scene))
    assert back == scene


def test_mandelbulb_power_validation():
    with pytest.raises(ValueError):
        mandelbulb_sdf(Mandelbulb(power=1))
