"""Neural SDF nodes: composition, differentiability, kernel compatibility,
and shape fitting through the differentiable renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ray_marching_tpu.render.march import march
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene.graph import (
    Affine,
    Box,
    Onion,
    Sphere,
    Union,
    compile_scene,
    param_paths,
)


def enclosed(node):
    """Wrap a scene in a room shell so every ray converges (open scenes
    produce reference-faithful diverged-ray NaN chaos in f32 gradients)."""
    return Union(children=(node, Onion(child=Box(halfsides=(5.0, 5.0, 5.0)),
                                       radius=0.1)))
from ray_marching_tpu.scene.neural import NeuralSDF

PX = 3.45e-6


def test_initial_field_is_sphere_like():
    node = NeuralSDF(hidden=(16, 16), scale=0.5)
    sdf_vec, _, params = compile_scene(node, jnp.float64)
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((256, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    # Near-zero-initialized MLP: the analytic skip term dominates.
    d_surface = np.asarray(sdf_vec(params, jnp.asarray(pts * 0.5)))
    assert np.abs(d_surface).max() < 0.05
    d_far = np.asarray(sdf_vec(params, jnp.asarray(pts * 3.0)))
    np.testing.assert_allclose(d_far, 2.5, atol=0.1)


def test_composes_with_csg_and_differentiates():
    scene = Union(
        children=(
            Affine(
                child=NeuralSDF(hidden=(8,), seed=1),
                orientation=(1.0, 0.0, 0.0, 0.0),
                translation=(0.0, 0.0, 1.0),
            ),
            Sphere(radius=0.4),
        )
    )
    sdf_vec, _, params = compile_scene(scene, jnp.float64)
    pts = jnp.asarray(np.random.default_rng(2).uniform(-2, 2, (32, 3)))
    d = sdf_vec(params, pts)
    assert np.isfinite(np.asarray(d)).all()
    grads = jax.grad(lambda p: jnp.sum(sdf_vec(p, pts) ** 2))(params)
    flat = param_paths(grads)
    assert any(k.startswith("c0/child/w") for k in flat)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat.values())


def test_marches_and_renders():
    node = enclosed(NeuralSDF(hidden=(16,), seed=3))
    cfg = RenderConfig(
        px_width=32, px_height=24,
        focal_length=PX * 24, sensor_width=PX * 32, sensor_height=PX * 24,
        marching_steps=24,
    )
    r = Renderer(node, cfg, dtype=jnp.float32)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    img = r.render(r.init_params, q, t, mode=0, degree=1)
    assert np.isfinite(np.asarray(img)).all()


def test_pallas_kernel_runs_neural_sdf():
    from ray_marching_tpu.ops.pallas_march import pallas_march

    node = NeuralSDF(hidden=(8, 8), seed=4)
    sdf_vec, sdf_c, params = compile_scene(node, jnp.float64)
    rng = np.random.default_rng(5)
    p0 = jnp.asarray(rng.uniform(-1.5, 1.5, (1, 8, 16, 3)))
    v = rng.standard_normal((1, 8, 16, 3))
    v = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))
    want = np.asarray(march(sdf_vec, params, p0, v, 8))
    got = np.asarray(pallas_march(sdf_c, params, p0, v, 8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


def test_neural_sdf_learns_an_ellipsoid_from_distances():
    """Direct distance-field regression: the MLP residual learns to deform
    the sphere skip into an ellipsoid."""
    node = NeuralSDF(hidden=(16, 16), seed=0, scale=0.5, w0=4.0)
    sdf_vec, _, params = compile_scene(node, jnp.float64)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (4096, 3)))
    # Target: scaled-sphere distance field of an ellipsoid (approximate SDF).
    a = jnp.asarray([0.7, 0.45, 0.55])
    target = (jnp.linalg.norm(np.asarray(pts) / a, axis=-1) - 1.0) * 0.5

    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = sdf_vec(p, pts)[..., 0]
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(300):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    assert losses[-1] < 2e-3


def test_inverse_rendering_trains_neural_weights():
    """Pixel-loss gradients reach the MLP weights through the full
    renderer (march + shading)."""
    node = enclosed(NeuralSDF(hidden=(8,), seed=1))
    cfg = RenderConfig(
        px_width=32, px_height=24,
        focal_length=PX * 24, sensor_width=PX * 32, sensor_height=PX * 24,
        marching_steps=16,
    )
    r = Renderer(node, cfg, dtype=jnp.float32)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    # Lambertian, not distance: the distance shader's min-max backward has a
    # reference-faithful NaN at the argmin pixel (0^(γ-1)·0), shared by torch.
    target = r.render(r.init_params, q, t, mode=0, degree=1) * 0.8

    def loss(p):
        return jnp.mean((r.render(p, q, t, mode=0, degree=1) - target) ** 2)

    val, grads = jax.value_and_grad(loss)(r.init_params)
    flat = param_paths(grads)
    weight_norm = sum(
        float(jnp.sum(jnp.abs(v)))
        for k, v in flat.items()
        if k.startswith("c0/w")
    )
    assert np.isfinite(float(val)) and weight_norm > 0


def test_sin_fast_accuracy_and_grad():
    """sin_fast (polynomial sine, round 5): f32-ulp-level accuracy over
    the pre-activation range a SIREN sees, exact-derivative-of-the-
    approximation gradients (cos to ~1e-6), and periodic range reduction."""
    from ray_marching_tpu.scene.neural import sin_fast

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-300.0, 300.0, 20000))
    np.testing.assert_allclose(
        np.asarray(sin_fast(x)), np.sin(np.asarray(x)), atol=1.2e-7
    )
    # f32 (the production dtype): the Cody-Waite reduction keeps the
    # error at polynomial-rounding level, not k*ulp(2pi) level — a
    # single-constant reduction would read ~6e-6 at |x| = 300
    x32 = x.astype(jnp.float32)
    exact = np.sin(np.asarray(x32, dtype=np.float64))  # sin of the f32 input
    np.testing.assert_allclose(
        np.asarray(sin_fast(x32)).astype(np.float64), exact, atol=2e-6
    )
    g = jax.vmap(jax.grad(sin_fast))(x)
    # the derivative of a VALUE-fit polynomial is less accurate than the
    # value itself (nothing minimizes its error directly): ~5e-6 max vs
    # cos — still far below any training-relevant scale
    np.testing.assert_allclose(
        np.asarray(g), np.cos(np.asarray(x)), atol=1e-5
    )


def test_sine_fast_activation_matches_sine():
    """activation='sine_fast' is a drop-in for 'sine': same SIREN init,
    same w0 scaling, field values within the polynomial's error bound,
    and it renders + differentiates through the fused kernel."""
    from ray_marching_tpu.scene.neural import (
        NeuralSDF,
        init_neural_params,
        neural_sdf,
    )

    a = NeuralSDF(hidden=(24, 24), seed=5, activation="sine",
                  impl="matmul")
    b = NeuralSDF(hidden=(24, 24), seed=5, activation="sine_fast",
                  impl="matmul")
    pa = init_neural_params(a, jnp.float64)
    pb = init_neural_params(b, jnp.float64)
    for ka, kb in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))
    fa, fb = neural_sdf(a), neural_sdf(b)
    rng = np.random.default_rng(1)
    x, y, z = (jnp.asarray(rng.uniform(-1.2, 1.2, 4096)) for _ in range(3))
    da = np.asarray(fa(pa, x, y, z))
    db = np.asarray(fb(pb, x, y, z))
    # two activation layers compound the 9.7e-8 poly error through O(1)
    # weights — stay well under 1e-5 on the field value
    np.testing.assert_allclose(da, db, atol=1e-5)

    from ray_marching_tpu.render.fast import FastRenderer
    from ray_marching_tpu.render.pipeline import RenderConfig

    px = 3.45e-6
    cfg = RenderConfig(px_width=48, px_height=32, focal_length=px * 32,
                       sensor_width=px * 48, sensor_height=px * 32,
                       marching_steps=6)
    r = FastRenderer(b, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True, march_impl="fused")
    # y-flip quaternion: at +z the identity pose faces AWAY from the
    # origin blob (all-miss image, zero gradients)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float64)
    img = r.render(r.init_params, q, t, mode=0, degree=1)
    assert np.isfinite(np.asarray(img)).all()
    g = jax.grad(
        lambda p: jnp.sum(r.render(p, q, t, mode=0, degree=1) ** 2)
    )(r.init_params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)
