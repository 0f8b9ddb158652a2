"""XLA march path (ops/xla_render.py + FastRenderer march_impl).

Matmul-dominated (wide NeuralSDF) scenes route the march to XLA — native
MXU tiling instead of the Mosaic mega-kernel's per-eval plane relayouts
(measured crossover: docs/PERFORMANCE.md "Neural SDFs on the MXU"). These
tests pin the XLA path to the fused (interpret-mode) kernel on every
backward variant, and the auto-dispatch heuristic.
"""

import jax
import jax.numpy as jnp
import pytest

from ray_marching_tpu.render.fast import (
    FastRenderer,
    scene_contains_matmul_neural,
)
from ray_marching_tpu.render.pipeline import RenderConfig
from ray_marching_tpu.scene.graph import Affine, Sphere, Union
from ray_marching_tpu.scene.neural import NeuralSDF

PX = 3.45e-6
W = H = 64


def _cfg(**kw):
    return RenderConfig(
        px_width=W, px_height=H, focal_length=PX * H,
        sensor_width=PX * W, sensor_height=PX * H, marching_steps=6, **kw
    )


POSE = (
    jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32),
    jnp.asarray([[0.0, 0.2, 2.0]], jnp.float32),
)


def _neural_scene():
    return NeuralSDF(hidden=(16, 16), seed=3, impl="matmul")


def _tree_max_diff(a, b):
    leaves = zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in leaves)


def test_auto_dispatch():
    cfg = _cfg()
    assert FastRenderer(_neural_scene(), cfg).march_impl == "xla"
    # width-16 'auto' impl now resolves matmul (round-5 crossover at 8)
    # -> below the fused threshold -> XLA march; truly tiny nets stay
    # componentwise -> analytic-style fused kernel
    assert FastRenderer(NeuralSDF(hidden=(16,)), cfg).march_impl == "xla"
    assert FastRenderer(NeuralSDF(hidden=(4,)), cfg).march_impl == "fused"
    assert FastRenderer(Sphere(0.5), cfg).march_impl == "fused"
    # nested neural nodes are found through combinators and transforms
    nested = Union((Sphere(0.5),
                    Affine(_neural_scene(), (1, 0, 0, 0), (0, 0, 0))))
    assert scene_contains_matmul_neural(nested)
    assert FastRenderer(nested, cfg).march_impl == "xla"
    # At/above NEURAL_MARCH_FUSED_MIN_WIDTH the fused backward wins
    # training 24-34% (docs/PERFORMANCE.md "XLA vs fused march") — wide
    # matmul scenes stay on the fused kernel.
    wide = NeuralSDF(hidden=(64, 64), seed=3, impl="matmul")
    assert FastRenderer(wide, cfg).march_impl == "fused"
    assert FastRenderer(
        Union((Sphere(0.5), wide)), cfg
    ).march_impl == "fused"
    # Cheap activations move the fused switch to 128 (activation-aware
    # dispatch, round 5: xla wins w64 sine_fast training, fused wins 128+)
    fast64 = NeuralSDF(hidden=(64, 64), seed=3, impl="matmul",
                       activation="sine_fast")
    assert FastRenderer(fast64, cfg).march_impl == "xla"
    fast128 = NeuralSDF(hidden=(128, 128), seed=3, impl="matmul",
                        activation="sine_fast")
    assert FastRenderer(fast128, cfg).march_impl == "fused"
    with pytest.raises(ValueError):
        FastRenderer(Sphere(0.5), cfg, march_impl="triton")


@pytest.mark.parametrize("tau", [0.0, 1e-3])
def test_forward_and_grad_parity(tau):
    cfg = _cfg(tau=tau)
    scene = _neural_scene()
    rx = FastRenderer(scene, cfg)  # auto -> xla
    rf = FastRenderer(scene, cfg, march_impl="fused")
    assert rx.march_impl == "xla" and rf.march_impl == "fused"
    q, t = POSE
    img_x = rx.render(rx.init_params, q, t, mode=0, degree=1)
    img_f = rf.render(rf.init_params, q, t, mode=0, degree=1)
    assert float(jnp.max(jnp.abs(img_x - img_f))) < 5e-5

    def loss(r):
        def f(p, q, t):
            img = r.render(p, q, t, mode=0, degree=1)
            return jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0)))
        return f

    gx = jax.grad(loss(rx), argnums=(0, 1, 2))(rx.init_params, q, t)
    gf = jax.grad(loss(rf), argnums=(0, 1, 2))(rf.init_params, q, t)
    assert _tree_max_diff(gx, gf) < 5e-5


def test_composite_scene_parity():
    cfg = _cfg()
    scene = Union((Sphere(0.6), _neural_scene()))
    rx = FastRenderer(scene, cfg)
    rf = FastRenderer(scene, cfg, march_impl="fused")
    assert rx.march_impl == "xla"
    q, t = POSE
    img_x = rx.render(rx.init_params, q, t, mode=4, degree=1)
    img_f = rf.render(rf.init_params, q, t, mode=4, degree=1)
    assert float(jnp.max(jnp.abs(img_x - img_f))) < 5e-5


def test_coverage_parity():
    cfg = _cfg()
    scene = _neural_scene()
    rx = FastRenderer(scene, cfg)
    rf = FastRenderer(scene, cfg, march_impl="fused")
    q, t = POSE

    def cov_loss(r):
        def f(p):
            img, alpha = r.render_with_alpha(p, q, t, mode=0, degree=1)
            return (jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0)))
                    + jnp.mean(alpha))
        return f

    out_x = rx.render_with_alpha(rx.init_params, q, t, mode=0, degree=1)
    out_f = rf.render_with_alpha(rf.init_params, q, t, mode=0, degree=1)
    assert _tree_max_diff(out_x, out_f) < 5e-5
    gx = jax.grad(cov_loss(rx))(rx.init_params)
    gf = jax.grad(cov_loss(rf))(rf.init_params)
    assert _tree_max_diff(gx, gf) < 5e-5


@pytest.mark.parametrize("with_alpha", [False, True])
def test_implicit_backward_parity(with_alpha):
    cfg = _cfg(backward="implicit")
    scene = _neural_scene()
    rx = FastRenderer(scene, cfg)
    rf = FastRenderer(scene, cfg, march_impl="fused")
    q, t = POSE

    def loss(r):
        def f(p):
            if with_alpha:
                img, alpha = r.render_with_alpha(p, q, t, mode=0, degree=1)
                extra = jnp.mean(alpha)
            else:
                img = r.render(p, q, t, mode=0, degree=1)
                extra = 0.0
            return jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0))) + extra
        return f

    gx = jax.grad(loss(rx))(rx.init_params)
    gf = jax.grad(loss(rf))(rf.init_params)
    assert _tree_max_diff(gx, gf) < 5e-5
