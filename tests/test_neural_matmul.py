"""MXU-native (matmul) NeuralSDF evaluator: parity with the componentwise
form, gradient agreement, impl dispatch, and end-to-end rendering through
both pipelines at widths 16/64/256.

The two evaluators compute the same function with different accumulation
order (plane FMAs vs matmul reductions); in float64 they agree to ~1e-15
relative. Capability anchor: SURVEY §7 "scene = data compiled to a pure
function"; there is no reference counterpart (the reference has no neural
SDFs) — this is the one workload where the TPU's matrix unit dominates
(VERDICT r2 #1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene.neural import (
    MATMUL_MIN_WIDTH,
    NeuralSDF,
    init_neural_params,
    neural_sdf,
    neural_sdf_componentwise,
    neural_sdf_matmul,
    resolve_impl,
)

PX = 3.45e-6


def _planes(width, seed=0):
    node = NeuralSDF(hidden=(width, width), seed=3)
    params = init_neural_params(node, jnp.float64)
    rng = np.random.default_rng(seed)
    x, y, z = (jnp.asarray(rng.normal(size=(8, 128))) for _ in range(3))
    return node, params, x, y, z


@pytest.mark.parametrize("width", [4, 16, 64])
def test_matmul_matches_componentwise_forward(width):
    """Width 256 is deliberately absent: the componentwise form needs
    O(width²) traced ops (2×65k at 256) and takes minutes just to trace —
    the pathology this evaluator removes. 256 is pinned against a numpy
    oracle below instead."""
    node, params, x, y, z = _planes(width)
    a = jax.jit(neural_sdf_componentwise(node))(params, x, y, z)
    b = jax.jit(neural_sdf_matmul(node))(params, x, y, z)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-13, atol=1e-14)


def _numpy_oracle(node, params, x, y, z):
    """Straightforward float64 numpy evaluation of the same MLP."""
    p = {k: np.asarray(v, np.float64) for k, v in params.items()}
    pts = np.stack([np.asarray(v).ravel() for v in (x, y, z)], axis=1)
    h = pts
    n_layers = len(node.hidden) + 1
    for i in range(n_layers):
        h = h @ p[f"w{i}"] + p[f"b{i}"]
        if i < n_layers - 1:
            scale = node.w0 if (i == 0 and node.activation == "sine") else 1.0
            h = np.sin(h * scale)
    base = np.sqrt((pts ** 2).sum(axis=1)) - p["radius"]
    return (base + h[:, 0]).reshape(np.shape(x))


@pytest.mark.parametrize("width", [64, 256])
def test_matmul_matches_numpy_oracle(width):
    node, params, x, y, z = _planes(width)
    got = jax.jit(neural_sdf_matmul(node))(params, x, y, z)
    want = _numpy_oracle(node, params, x, y, z)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("width", [16, 32])
@pytest.mark.slow
def test_matmul_matches_componentwise_gradients(width):
    """Width caps at 32: the componentwise WIDTH-64 backward graph takes
    >9 min of XLA CPU compile (measured; the matmul one takes 0.18 s) —
    the compile-time pathology is itself part of what the matmul impl
    fixes. Wide-width gradient correctness is covered by the numpy-oracle
    forward pins plus the width-64 matmul-vs-finite-difference test."""
    node, params, x, y, z = _planes(width)
    fc = neural_sdf_componentwise(node)
    fm = neural_sdf_matmul(node)
    ga = jax.jit(jax.grad(lambda p: jnp.sum(fc(p, x, y, z) ** 2)))(params)
    gb = jax.jit(jax.grad(lambda p: jnp.sum(fm(p, x, y, z) ** 2)))(params)
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(ga),
        jax.tree_util.tree_leaves_with_path(gb),
    ):
        scale = max(1.0, float(jnp.max(jnp.abs(va))))
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-10, atol=1e-11 * scale,
            err_msg=jax.tree_util.keystr(ka),
        )


def test_matmul_gradients_match_finite_differences_width64():
    """Wide-width gradient correctness without the componentwise compile
    pathology: central finite differences on representative leaves."""
    node, params, x, y, z = _planes(64)
    fm = neural_sdf_matmul(node)
    loss = lambda p: float(jnp.sum(fm(p, x, y, z) ** 2))
    g = jax.jit(jax.grad(lambda p: jnp.sum(fm(p, x, y, z) ** 2)))(params)
    eps = 1e-6
    for key, idx in [("radius", ()), ("w1", (3, 5)), ("b0", (7,)),
                     ("w2", (11, 0))]:
        def perturbed(delta):
            p = dict(params)
            leaf = np.asarray(p[key], np.float64).copy()
            leaf[idx] += delta
            p[key] = jnp.asarray(leaf)
            return loss(p)

        fd = (perturbed(eps) - perturbed(-eps)) / (2 * eps)
        got = float(np.asarray(g[key])[idx])
        # rtol bounded by FD truncation for a w0=8 SIREN (third derivative
        # ~ w0³); exactness at smaller widths is pinned against the
        # componentwise evaluator above.
        np.testing.assert_allclose(got, fd, rtol=1e-3, atol=1e-8,
                                   err_msg=f"{key}{idx}")


def test_matmul_scalar_and_broadcast_calls():
    """The evaluator contract allows scalars and broadcastable mixed shapes
    (golden harness calls it at single points)."""
    node, params, *_ = _planes(16)
    fm = neural_sdf_matmul(node)
    fc = neural_sdf_componentwise(node)
    s = fm(params, jnp.asarray(0.3), jnp.asarray(-0.2), jnp.asarray(0.7))
    assert s.shape == ()
    np.testing.assert_allclose(
        float(s),
        float(fc(params, jnp.asarray(0.3), jnp.asarray(-0.2), jnp.asarray(0.7))),
        rtol=1e-13,
    )
    x = jnp.linspace(-1, 1, 6).reshape(6, 1)
    y = jnp.linspace(-1, 1, 5).reshape(1, 5)
    z = jnp.asarray(0.1)
    out = fm(params, x, y, z)
    assert out.shape == (6, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fc(params, x, y, z)),
                               rtol=1e-13, atol=1e-14)


def test_impl_dispatch():
    assert resolve_impl(NeuralSDF(hidden=(16, 16))) == "matmul"
    assert resolve_impl(NeuralSDF(hidden=(4, 4))) == "componentwise"
    assert resolve_impl(NeuralSDF(hidden=(MATMUL_MIN_WIDTH,))) == "matmul"
    assert resolve_impl(NeuralSDF(hidden=(16,), impl="matmul")) == "matmul"
    assert resolve_impl(NeuralSDF(hidden=(256,), impl="componentwise")) == \
        "componentwise"
    with pytest.raises(ValueError, match="unknown NeuralSDF impl"):
        neural_sdf(NeuralSDF(hidden=(8,), impl="nope"))


def test_impl_serializes(tmp_path):
    from ray_marching_tpu.scene.serialize import load_scene, save_scene

    node = NeuralSDF(hidden=(64, 64), impl="matmul", seed=5)
    p = save_scene(tmp_path / "s.json", node)
    assert load_scene(p) == node


def _render_cfg(w=64, h=48, steps=8):
    return RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps,
    )


@pytest.mark.parametrize("width", [32])
@pytest.mark.slow
def test_fast_kernel_matmul_matches_componentwise_render(width):
    """The fused mega-kernel (interpret on CPU) renders the matmul impl;
    pixels match the componentwise impl to fp-reassociation tolerance.
    Width 32 keeps the componentwise interpret-mode trace tractable; the
    real-TPU compile at 64/256 is exercised by tools/neural_width_sweep.py."""
    cfg = _render_cfg(steps=6)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.1, 1.5]], jnp.float64)
    imgs = {}
    for impl in ("componentwise", "matmul"):
        node = NeuralSDF(hidden=(width, width), seed=3, impl=impl)
        # march_impl='fused': this test pins the Mosaic KERNEL's matmul
        # lowering (auto would route matmul scenes to the XLA march).
        f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                         interpret=True, march_impl="fused")
        imgs[impl] = np.asarray(f.jitted(mode=0, degree=1)(f.init_params, q, t))
    a, b = imgs["componentwise"], imgs["matmul"]
    m = np.isfinite(a) & np.isfinite(b)
    assert m.mean() > 0.5
    np.testing.assert_allclose(a[m], b[m], rtol=1e-9, atol=1e-10)


def test_fast_kernel_matmul_gradients_flow():
    """Forward+backward through the fused kernel pair with the matmul
    evaluator (jax.vjp of the matmul chain must lower in the backward
    kernel too — interpret mode on CPU; the real-TPU lowering is pinned by
    tools/neural_width_sweep.py measurements in docs/PERFORMANCE.md)."""
    cfg = _render_cfg(w=32, h=24, steps=6)
    node = NeuralSDF(hidden=(64,), seed=3, impl="matmul")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.1, 1.5]], jnp.float64)

    def loss(p):
        img = f.render(p, q, t, mode=0, degree=1)
        return jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0)))

    g = jax.jit(jax.grad(loss))(f.init_params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
    assert any(float(jnp.max(jnp.abs(v))) > 0 for v in leaves)

    # and against the modular pipeline's gradient (same evaluator).
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)

    def loss_mod(p):
        img = r.render(p, q, t, mode=0, degree=1)
        return jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0)))

    gm = jax.jit(jax.grad(loss_mod))(r.init_params)
    for (ka, va), (_, vb) in zip(
        jax.tree_util.tree_leaves_with_path(g),
        jax.tree_util.tree_leaves_with_path(gm),
    ):
        scale = max(1e-12, float(jnp.max(jnp.abs(vb))))
        np.testing.assert_allclose(
            np.asarray(va) / scale, np.asarray(vb) / scale,
            rtol=1e-7, atol=1e-8,
            err_msg=jax.tree_util.keystr(ka),
        )


def test_matmul_bf16_operands_approximate_f32():
    """matmul_dtype='bfloat16' (native single-pass MXU) approximates the
    f32 evaluator to bf16 operand precision and keeps f32 accumulation."""
    node32 = NeuralSDF(hidden=(64, 64), seed=3, impl="matmul")
    node16 = NeuralSDF(hidden=(64, 64), seed=3, impl="matmul",
                       matmul_dtype="bfloat16")
    params = init_neural_params(node32, jnp.float32)
    rng = np.random.default_rng(0)
    x, y, z = (jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
               for _ in range(3))
    a = jax.jit(neural_sdf(node32))(params, x, y, z)
    b = jax.jit(neural_sdf(node16))(params, x, y, z)
    assert b.dtype == jnp.float32
    diff = float(jnp.max(jnp.abs(a - b)))
    assert 0 < diff < 0.05, diff  # bf16 rounding, not wrong math
    # f64 inputs bypass the cast entirely (exact golden paths stay exact).
    x64 = x.astype(jnp.float64)
    p64 = init_neural_params(node32, jnp.float64)
    a64 = neural_sdf(node32)(p64, x64, y.astype(jnp.float64),
                             z.astype(jnp.float64))
    b64 = neural_sdf(node16)(p64, x64, y.astype(jnp.float64),
                             z.astype(jnp.float64))
    np.testing.assert_array_equal(np.asarray(a64), np.asarray(b64))


def test_dual_issue_bitwise(monkeypatch):
    """RM_TPU_NEURAL_DUAL (half-tile dual-issue probe, measured neutral on
    v5e — ops/pallas_render.py) must stay BITWISE identical to the
    single-chain kernel, images and gradients, including the row-sliced
    history handoff."""
    monkeypatch.setenv("RM_TPU_NEURAL_DUAL", "1")
    cfg = _render_cfg(steps=6)
    node = NeuralSDF(hidden=(16, 16), seed=3, impl="matmul",
                     activation="sine_fast")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True, march_impl="fused")
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.1, 1.5]], jnp.float64)

    def run():
        img = f.render(f.init_params, q, t, mode=0, degree=1)
        g = jax.grad(
            lambda p: jnp.sum(
                jnp.nan_to_num(f.render(p, q, t, mode=0, degree=1)) ** 2
            )
        )(f.init_params)
        return np.asarray(img), jax.tree_util.tree_leaves(g)

    img_d, g_d = run()
    monkeypatch.setenv("RM_TPU_NEURAL_DUAL", "0")
    f2 = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                      interpret=True, march_impl="fused")
    img_s = np.asarray(f2.render(f2.init_params, q, t, mode=0, degree=1))
    g_s = jax.tree_util.tree_leaves(jax.grad(
        lambda p: jnp.sum(
            jnp.nan_to_num(f2.render(p, q, t, mode=0, degree=1)) ** 2
        )
    )(f2.init_params))
    np.testing.assert_array_equal(np.nan_to_num(img_d), np.nan_to_num(img_s))
    for a, b in zip(g_d, g_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
