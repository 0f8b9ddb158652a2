"""Plane-native FastRenderer: parity with the modular pipeline + grads.

The modular pipeline is itself golden-parity-tested against the PyTorch
reference, so agreement here transitively pins the fast path to reference
semantics.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import param_paths

PX = 3.45e-6


def make_pair(scene="test_scene2", w=96, h=64, steps=16, dtype=jnp.float64):
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps,
    )
    node = registry.make_scene(scene)
    grid = np.float64 if dtype == jnp.float64 else np.float32
    r = Renderer(node, cfg, dtype=dtype, grid_dtype=grid)
    f = FastRenderer(node, cfg, dtype=dtype, grid_dtype=grid, interpret=True)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], dtype)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], dtype)
    return r, f, q, t


@pytest.mark.parametrize("mode", range(8))
def test_image_parity_all_modes(mode):
    r, f, q, t = make_pair()
    a = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=2))
    b = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12, equal_nan=True)


def test_image_parity_smooth_union_scene():
    r, f, q, t = make_pair("test_scene")
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.3, -2.0]], jnp.float64)
    for mode in (0, 5, 7):
        a = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=1))
        b = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=1))
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)


def test_gradients_match_modular():
    r, f, q, t = make_pair(steps=12)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((1, 64, 96, 3)))

    def loss(render_fn, params):
        return jnp.sum(render_fn(params, q, t, mode=0, degree=2) * w)

    g1 = param_paths(jax.grad(lambda p: loss(r.render, p))(r.init_params))
    g2 = param_paths(jax.grad(lambda p: loss(f.render, p))(f.init_params))
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-6, atol=1e-10,
            err_msg=k,
        )


def test_odd_resolution():
    r, f, q, t = make_pair(w=37, h=23)
    a = np.asarray(r.render(r.init_params, q, t, mode=4, degree=1))
    b = np.asarray(f.render(f.init_params, q, t, mode=4, degree=1))
    assert b.shape == (1, 23, 37, 3)
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_multi_camera_default_pose_shape():
    cfg = RenderConfig(num_cameras=2, px_width=16, px_height=8,
                       marching_steps=4)
    f = FastRenderer(registry.make_scene("single_sphere"), cfg,
                     interpret=True)
    q, t = f.default_pose()
    assert q.shape == (2, 4) and t.shape == (2, 3)
    img = f.render(f.init_params, q, t, mode=1, degree=1)
    assert img.shape == (2, 8, 16, 3)


def test_reflection_bounce_matches_modular():
    cfg = RenderConfig(
        px_width=64, px_height=48,
        focal_length=PX * 48, sensor_width=PX * 64, sensor_height=PX * 48,
        marching_steps=24, reflection_bounces=1,
    )
    node = registry.make_scene("test_scene2")
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float64)
    for mode in (0, 4, 7):
        a = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=1))
        b = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=1))
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)


def test_pose_gradients_match_modular():
    """Camera-pose cotangents flow through the fused backward kernel's
    rays7 cotangent path (position + direction planes)."""
    r, f, q, t = make_pair(steps=12)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((1, 64, 96, 3)))

    def loss(render_fn, params, q, t):
        return jnp.sum(render_fn(params, q, t, mode=0, degree=2) * w)

    g1 = jax.grad(lambda q, t: loss(r.render, r.init_params, q, t), argnums=(0, 1))(q, t)
    g2 = jax.grad(lambda q, t: loss(f.render, f.init_params, q, t), argnums=(0, 1))(q, t)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


def test_tau_nonzero_fused_backward_matches_modular():
    """Early-exit mode (tau > 0) runs through the fused backward kernel
    with the per-step freeze mask (round 2 — previously a checkpointed-
    scan fallback); gradients must match the modular scan march at a tau
    large enough that rays actually freeze."""
    cfg = RenderConfig(
        px_width=96, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 96, sensor_height=PX * 64,
        marching_steps=16, tau=1e-3,
    )
    node = registry.make_scene("test_scene2")
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((1, 64, 96, 3)))

    def loss(render_fn, params):
        return jnp.sum(render_fn(params, q, t, mode=0, degree=1) * w)

    g1 = param_paths(jax.grad(lambda p: loss(r.render, p))(r.init_params))
    g2 = param_paths(jax.grad(lambda p: loss(f.render, p))(f.init_params))
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-6, atol=1e-10,
            err_msg=k,
        )


def test_implicit_backward_matches_modular_implicit():
    """FastRenderer(backward='implicit') reproduces the modular IFT
    gradients exactly — the silhouette approximation is shared, not a fast-
    path artifact."""
    import dataclasses

    cfg = RenderConfig(
        px_width=96, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 96, sensor_height=PX * 64,
        marching_steps=32, backward="implicit",
    )
    node = registry.make_scene("test_scene2")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((1, 64, 96, 3)))
    g1 = param_paths(
        jax.grad(lambda p: jnp.sum(f.render(p, q, t, mode=0, degree=1) * w))(
            f.init_params
        )
    )
    g2 = param_paths(
        jax.grad(lambda p: jnp.sum(r.render(p, q, t, mode=0, degree=1) * w))(
            r.init_params
        )
    )
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-6, atol=1e-9,
            err_msg=k,
        )


@pytest.mark.slow
def test_multi_camera_rows_cross_tile_boundary():
    """Six cameras × 24 rows = 144 stacked rows — NOT a multiple of the
    fused kernels' 128-row (fwd) / 64-row (bwd) tiles. Round 1 truncated
    the grid to floor(rows/tile) tiles, silently never marching the last
    cameras (camera 5 rendered all-NaN). The kernels now pad rows to a
    tile multiple internally."""
    cfg = RenderConfig(
        num_cameras=6, px_width=64, px_height=48,
        focal_length=PX * 48, sensor_width=PX * 64, sensor_height=PX * 48,
        marching_steps=12,
    )
    node = registry.make_scene("test_scene2")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    assert f.rows == 144 and f.rows % 128 != 0  # the failing configuration
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((6, 4)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jnp.asarray(rng.standard_normal((6, 3)) * 0.3 + [0.0, 0.0, 2.0])
    img = np.asarray(f.render(f.init_params, q, t, mode=0, degree=1))
    assert img.shape == (6, 48, 64, 3)
    assert np.isfinite(img).all()

    # Every camera must match the same pose rendered alone (lambertian has
    # no cross-camera normalization coupling).
    cfg1 = RenderConfig(
        num_cameras=1, px_width=64, px_height=48,
        focal_length=PX * 48, sensor_width=PX * 64, sensor_height=PX * 48,
        marching_steps=12,
    )
    f1 = FastRenderer(node, cfg1, dtype=jnp.float64, grid_dtype=np.float64,
                      interpret=True)
    for n in range(6):
        one = np.asarray(
            f1.render(f1.init_params, q[n:n + 1], t[n:n + 1], mode=0, degree=1)
        )
        np.testing.assert_allclose(img[n], one[0], rtol=1e-12, atol=1e-14,
                                   err_msg=f"camera {n}")

    # Gradient path: rows=144 also exercises the fused backward's 64-row
    # tile padding (144 % 64 = 16).
    g = jax.grad(
        lambda p: jnp.sum(f.render(p, q, t, mode=0, degree=1) ** 2)
    )(f.init_params)
    flat = param_paths(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in flat.values())
    assert any(np.abs(np.asarray(v)).max() > 0 for v in flat.values())


@pytest.mark.slow
def test_neural_scene_fast_gradients():
    """Neural scenes have >128 flat parameters: the fused backward's
    per-tile parameter cotangent must spill across multiple 128-lane rows
    (round 1 raised on jnp.pad with negative width). Pin against the
    modular renderer's gradients. A bare (12,12) MLP (218 params) at 16²/4
    steps exercises the same spill as the full neural_demo scene at ~1/10
    the interpret-mode tracing cost (neural_demo itself renders through
    the fused kernel in tests/test_neural.py)."""
    from jax.flatten_util import ravel_pytree

    from ray_marching_tpu.scene.neural import NeuralSDF

    cfg = RenderConfig(
        px_width=16, px_height=16,
        focal_length=PX * 16, sensor_width=PX * 16, sensor_height=PX * 16,
        marching_steps=4,
    )
    node = NeuralSDF(hidden=(12, 12), seed=7, scale=0.6, w0=6.0)
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    flat, _ = ravel_pytree(f.init_params)
    assert flat.shape[0] > 128  # the failing configuration
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float64)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((1, 16, 16, 3)))

    def loss(render_fn, params):
        return jnp.sum(render_fn(params, q, t, mode=0, degree=1) * w)

    g1 = param_paths(jax.grad(lambda p: loss(r.render, p))(r.init_params))
    g2 = param_paths(jax.grad(lambda p: loss(f.render, p))(f.init_params))
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-6, atol=1e-10,
            err_msg=k,
        )


def make_alpha_pair(num_cameras=2, steps=16, tau=0.0):
    """The silhouette fixture (box, face-on + side view) as a
    modular/fast pair — see tests/test_silhouette.py for why this scene
    is the canonical pixel-loss stall."""
    from ray_marching_tpu.scene.graph import Box

    cfg = RenderConfig(
        num_cameras=num_cameras, px_width=48, px_height=48,
        focal_length=PX * 48, sensor_width=PX * 48, sensor_height=PX * 48,
        marching_steps=steps, normals_eps=1e-3, tau=tau,
    )
    node = Box(halfsides=(0.3, 0.3, 0.2))
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    s2 = 0.5 ** 0.5
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0], [s2, 0.0, -s2, 0.0]][:num_cameras],
                    jnp.float64)
    t = jnp.asarray([[0.0, 0.0, 2.0], [2.0, 0.0, 0.0]][:num_cameras],
                    jnp.float64)
    return r, f, q, t


def test_render_with_alpha_matches_modular():
    """The mega-kernel's 9th plane (min_f) reproduces the modular
    march_with_closest coverage exactly: image and alpha parity."""
    r, f, q, t = make_alpha_pair()
    ia, aa = r.render_with_alpha(r.init_params, q, t, mode=0, beta=0.1)
    ib, ab = f.render_with_alpha(f.init_params, q, t, mode=0, beta=0.1)
    assert np.asarray(ab).shape == (2, 48, 48, 1)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib),
                               rtol=1e-9, atol=1e-11, equal_nan=True)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ab),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_alpha_gradients_match_modular():
    """Silhouette gradients through the fused backward kernel: the min_f
    cotangent is routed to the arg-min march step in-kernel and must match
    the modular jnp.minimum-chain autodiff."""
    from ray_marching_tpu.render.silhouette import composite

    r, f, q, t = make_alpha_pair()

    def loss(render_fn, p):
        img, a = render_fn(p, q, t, mode=0, beta=0.1)
        return jnp.mean(composite(img, a) ** 2) + jnp.mean(a ** 2)

    g1 = jax.grad(lambda p: loss(r.render_with_alpha, p))(r.init_params)
    g2 = jax.grad(lambda p: loss(f.render_with_alpha, p))(f.init_params)
    h1 = np.asarray(g1["halfsides"])
    h2 = np.asarray(g2["halfsides"])
    assert np.abs(h1).min() > 0  # the silhouette signal exists
    np.testing.assert_allclose(h1, h2, rtol=1e-6, atol=1e-12)


def test_alpha_pose_gradients_match_modular():
    """Camera-pose cotangents through the coverage path (min_f depends on
    the ray origin/direction planes via the whole trajectory)."""
    r, f, q, t = make_alpha_pair(steps=12)

    def loss(render_fn, q, t):
        _, a = render_fn(q, t, mode=0, beta=0.1)
        return jnp.mean(a ** 2)

    g1 = jax.grad(
        lambda q, t: loss(partial(r.render_with_alpha, r.init_params), q, t),
        argnums=(0, 1),
    )(q, t)
    g2 = jax.grad(
        lambda q, t: loss(partial(f.render_with_alpha, f.init_params), q, t),
        argnums=(0, 1),
    )(q, t)
    for a, b in zip(g1, g2):
        # atol: the axis-aligned pose zeroes several components to pure
        # roundoff (~1e-16), where the two summation orders differ.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-12)


@pytest.mark.slow
def test_alpha_tau_matches_modular():
    """Coverage gradients at tau > 0 (fused backward with the freeze mask
    + tie-splitting over the frozen steps' repeated min_f evaluations)
    match the modular march_with_closest autodiff."""
    r_tau, f_tau, q, t = make_alpha_pair(num_cameras=1, steps=16, tau=1e-3)
    ia, aa = r_tau.render_with_alpha(r_tau.init_params, q, t, mode=0, beta=0.1)
    ib, ab = f_tau.render_with_alpha(f_tau.init_params, q, t, mode=0, beta=0.1)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ab),
                               rtol=1e-9, atol=1e-12)

    def loss(render_fn, p):
        img, a = render_fn(p, q, t, mode=0, beta=0.1)
        return jnp.mean(img ** 2) + jnp.mean(a ** 2)

    g1 = jax.grad(lambda p: loss(r_tau.render_with_alpha, p))(r_tau.init_params)
    g2 = jax.grad(lambda p: loss(f_tau.render_with_alpha, p))(f_tau.init_params)
    np.testing.assert_allclose(
        np.asarray(g1["halfsides"]), np.asarray(g2["halfsides"]),
        rtol=1e-6, atol=1e-12,
    )


def test_alpha_reflection_bounces_rejected():
    from ray_marching_tpu.scene.graph import Box

    cfg = RenderConfig(px_width=16, px_height=8, marching_steps=4,
                       reflection_bounces=1)
    f = FastRenderer(Box(halfsides=(0.3, 0.3, 0.2)), cfg, interpret=True)
    q, t = f.default_pose()
    with pytest.raises(ValueError, match="reflection bounces"):
        f.render_with_alpha(f.init_params, q, t)


def test_fourier_cmap_parity_fast_vs_modular():
    """With cmap_fourier both renderers evaluate the same series — exact
    agreement (and near-agreement with the gather path)."""
    import dataclasses

    r0, f0, q, t = make_pair(steps=12)
    cfg = dataclasses.replace(r0.config, cmap_fourier=True)
    node = registry.make_scene("test_scene2")
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    for mode in (6, 7):
        a = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=2))
        b = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12,
                                   equal_nan=True)
        # Against the exact gather: within table-quantization + fit error
        # (the brightness factor is ≤ ~1 here).
        exact = np.asarray(r0.render(r0.init_params, q, t, mode=mode, degree=2))
        mask = np.isfinite(exact)
        assert np.abs((exact - b)[mask]).max() < 2e-2


@pytest.mark.slow
def test_multi_camera_matches_modular():
    """Two-camera batch: cameras stack along plane rows; global shader
    normalizations span the whole batch (reference semantics). Spin/tangent
    allow a handful of colourmap-index boundary flips: the axis-aligned
    pose puts wall-normal angles exactly on floor() boundaries where 1-ulp
    noise picks the neighbouring row."""
    cfg = RenderConfig(
        num_cameras=2, px_width=64, px_height=48,
        focal_length=PX * 48, sensor_width=PX * 64, sensor_height=PX * 48,
        marching_steps=16,
    )
    node = registry.make_scene("test_scene2")
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray(
        [[0.0, 0.0, 1.0, 0.0], [0.1, 0.02, 0.99, 0.01]], jnp.float64
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jnp.asarray([[0.0, 0.2, 2.0], [0.2, 0.1, 2.2]], jnp.float64)
    for mode in range(8):
        a = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=2))
        b = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
        assert b.shape == (2, 48, 64, 3)
        close = np.isclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)
        if mode in (6, 7):
            assert (~close).mean() < 0.005, f"mode {mode}: {(~close).mean()}"
        else:
            assert close.all(), f"mode {mode}"


@pytest.mark.parametrize("steps,w,h", [(12, 96, 64), (66, 192, 96)])
@pytest.mark.slow
def test_hist_handoff_backward_bitwise(monkeypatch, steps, w, h):
    """The forward mega-kernel's logged march history lets the fused
    backward skip its in-kernel forward recompute; the trajectories are the
    same elementwise op sequence, so gradients must be BITWISE identical
    with the handoff on and off. steps=66 exercises the fori_loop logging
    path (> MAX_UNROLL_STEPS) and 192×96 the padded-tile path
    (144 rows % 128-row tiles)."""
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps,
    )
    node = registry.make_scene("test_scene2")
    f = FastRenderer(node, cfg, dtype=jnp.float32, interpret=True)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float32)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float32)
    rng = np.random.default_rng(3)
    wgt = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)

    def loss(params):
        return jnp.sum(f.render(params, q, t, mode=0, degree=2) * wgt)

    monkeypatch.setenv("RM_TPU_BWD_HIST", "1")
    g1 = param_paths(jax.grad(loss)(f.init_params))
    monkeypatch.setenv("RM_TPU_BWD_HIST", "0")
    g2 = param_paths(jax.grad(loss)(f.init_params))
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_array_equal(
            np.asarray(g1[k]), np.asarray(g2[k]), err_msg=k
        )


@pytest.mark.parametrize("steps,w,h", [(19, 96, 64), (16, 192, 96)])
@pytest.mark.slow
def test_hist_handoff_tau_backward_bitwise(monkeypatch, steps, w, h):
    """tau > 0 history handoff: the early-exit forward logs its march
    history up to the per-tile exit step (dynamic-index stores) and hands
    the step count over as an int32 plane; the fused backward skips its
    recompute and runs a segment-aligned partially-unrolled reverse sweep.
    Must be bitwise identical to the in-kernel-recompute path. steps=19
    exercises the EXIT_SEG tail prologue; 192×96 the padded-tile path."""
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps, tau=1e-3,
    )
    node = registry.make_scene("test_scene2")
    f = FastRenderer(node, cfg, dtype=jnp.float32, interpret=True)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float32)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float32)
    rng = np.random.default_rng(7)
    wgt = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)

    def loss(params):
        return jnp.sum(f.render(params, q, t, mode=0, degree=2) * wgt)

    monkeypatch.setenv("RM_TPU_BWD_HIST", "1")
    g1 = param_paths(jax.grad(loss)(f.init_params))
    monkeypatch.setenv("RM_TPU_BWD_HIST", "0")
    g2 = param_paths(jax.grad(loss)(f.init_params))
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_array_equal(
            np.asarray(g1[k]), np.asarray(g2[k]), err_msg=k
        )


def test_hist_handoff_coverage_backward_bitwise(monkeypatch):
    """Coverage (render_with_alpha) handoff: the forward kernel hands over
    history + min_f + arg-min step; the backward's min_f cotangent routing
    must be bitwise identical to the recompute path."""
    cfg = RenderConfig(
        px_width=192, px_height=96,
        focal_length=PX * 96, sensor_width=PX * 192, sensor_height=PX * 96,
        marching_steps=10,
    )
    f = FastRenderer(registry.make_scene("test_scene2"), cfg,
                     dtype=jnp.float32, interpret=True)
    q, t = f.default_pose()
    rng = np.random.default_rng(7)
    wt_img = jnp.asarray(rng.standard_normal((1, 96, 192, 3)), jnp.float32)
    wt_a = jnp.asarray(rng.standard_normal((1, 96, 192, 1)), jnp.float32)

    def loss(params):
        img, alpha = f.render_with_alpha(params, q, t, mode=0, degree=2)
        return jnp.sum(img * wt_img) + jnp.sum(alpha * wt_a)

    monkeypatch.setenv("RM_TPU_BWD_HIST", "1")
    g1 = param_paths(jax.grad(loss)(f.init_params))
    monkeypatch.setenv("RM_TPU_BWD_HIST", "0")
    g2 = param_paths(jax.grad(loss)(f.init_params))
    for k in g1:
        np.testing.assert_array_equal(
            np.asarray(g1[k]), np.asarray(g2[k]), err_msg=k
        )


def test_two_level_recompute_gradients_match(monkeypatch):
    """The opt-in two-level recompute backward (RM_TPU_BWD_TWO_LEVEL=1 —
    the memory escape hatch for step counts whose position history cannot
    fit) must reproduce the default fused-backward gradients. Segment
    re-march replays bitwise-identical positions; only the cotangent
    accumulation associates differently, so f64 agreement is ~1e-12
    relative. Previously untested — the round-4 pad refactor touched its
    branch."""
    from ray_marching_tpu.ops import pallas_backward as pb

    cfg = RenderConfig(
        px_width=96, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 96, sensor_height=PX * 64,
        marching_steps=16,  # divisible by CKPT_INTERVAL, engages 2l
    )
    f = FastRenderer(registry.make_scene("test_scene2"), cfg,
                     dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    rng = np.random.default_rng(5)
    wgt = jnp.asarray(rng.standard_normal((1, 64, 96, 3)))

    def loss(params):
        return jnp.sum(f.render(params, q, t, mode=0, degree=2) * wgt)

    monkeypatch.setenv("RM_TPU_BWD_TWO_LEVEL", "1")
    g2l = param_paths(jax.grad(loss)(f.init_params))
    assert pb.LAST_PATH["two_level"] is True
    monkeypatch.delenv("RM_TPU_BWD_TWO_LEVEL")
    g = param_paths(jax.grad(loss)(f.init_params))
    assert pb.LAST_PATH["two_level"] is False
    for k in g:
        np.testing.assert_allclose(
            np.asarray(g2l[k]), np.asarray(g[k]), rtol=1e-9, atol=1e-11,
            err_msg=k,
        )


def test_history_handoff_engages_at_non_tile_multiple_rows():
    """Round-4 regression pin: the march-history handoff must engage at
    row counts the forward and backward kernels would pad differently.
    A round-3 refactor silently switched the forward to pallas_march's
    256-row tile default (25% slower kernel — the measured 238-vs-251
    Mrays/s regression) and made the handoff's old padded-shape-equality
    guard trip at such sizes. The backward now adapts its tile (gcd with
    the history's padded rows) and pads the rays to the history, so
    use_hist must be True here by construction — this 200-row case
    (renderer pads to 8s below 2 M rays; 200 is no multiple of either
    kernel tile) is the shape that silently dropped before."""
    from ray_marching_tpu.ops import pallas_backward as pb

    w = h = 160  # 25600 rays -> 200 plane rows (8-row renderer padding)
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=8,
    )
    f = FastRenderer(registry.make_scene("test_scene2"), cfg,
                     dtype=jnp.float32, interpret=True)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float32)

    def loss(params):
        return jnp.sum(f.render(params, q, t, mode=0, degree=2))

    jax.grad(loss)(f.init_params)
    assert pb.LAST_PATH["use_hist"] is True


def test_tau_handoff_disabled_when_bwd_tile_spans_fwd_tiles(monkeypatch):
    """The tau>0 exit-step plane is constant per FORWARD (128-row) tile and
    history planes past a tile's exit step are unwritten, so a backward
    tile spanning several forward tiles must NOT use the handoff (it would
    apply tile 0's exit step to rows whose history stops earlier). With
    rows divisible by the larger backward tile the padded-row check alone
    passes — the divisibility guard must trip, and gradients must still be
    bitwise equal to the recompute path."""
    from ray_marching_tpu.ops import pallas_backward as pb

    w, h = 512, 64  # 256 plane rows: divisible by a 256-row backward tile
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=16, tau=1e-3,
    )
    f = FastRenderer(registry.make_scene("test_scene2"), cfg,
                     dtype=jnp.float32, interpret=True)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float32)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float32)
    rng = np.random.default_rng(11)
    wgt = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)

    def loss(params):
        return jnp.sum(f.render(params, q, t, mode=0, degree=2) * wgt)

    monkeypatch.setattr(pb, "BWD_ROWS_PER_TILE", 256)
    monkeypatch.setenv("RM_TPU_BWD_HIST", "1")
    g1 = param_paths(jax.grad(loss)(f.init_params))
    assert pb.LAST_PATH["use_hist"] is False  # guard tripped
    monkeypatch.setenv("RM_TPU_BWD_HIST", "0")
    g2 = param_paths(jax.grad(loss)(f.init_params))
    for k in g1:
        np.testing.assert_array_equal(
            np.asarray(g1[k]), np.asarray(g2[k]), err_msg=k
        )


@pytest.mark.slow
def test_wide_union_32_leaves_matches_modular():
    """WIDE scenes through the mega-kernel (the fuzzer only nests deep):
    a 32-leaf hard union of transformed spheres — 32 coordinate-plane
    register sets and a 32-segment flat params vector in one kernel —
    renders and differentiates identically to the modular path
    (tools/scene_width_sweep.py measures the on-chip compile/frame
    scaling of the same construction at up to 128 leaves; 32 keeps the
    interpret-mode CPU trace tractable for CI)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.scene_width_sweep import build_wide_scene

    node = build_wide_scene(32, seed=7)
    w, h = 48, 32
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=6,
    )
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float64)
    a = np.asarray(r.render(r.init_params, q, t, mode=0, degree=1))
    b = np.asarray(f.render(f.init_params, q, t, mode=0, degree=1))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12, equal_nan=True)

    rng = np.random.default_rng(1)
    wts = jnp.asarray(rng.standard_normal((1, h, w, 3)))

    def loss(render_fn, params):
        return jnp.sum(render_fn(params, q, t, mode=0, degree=1) * wts)

    g1 = param_paths(jax.grad(lambda p: loss(r.render, p))(r.init_params))
    g2 = param_paths(jax.grad(lambda p: loss(f.render, p))(f.init_params))
    assert set(g1) == set(g2) and len(g1) == 32 * 3  # radius+quat+trans
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-7, atol=1e-10,
            err_msg=k,
        )
