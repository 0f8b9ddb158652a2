"""Tiled (strip) rendering: parity with the one-pass fast renderer.

The fast renderer is pinned to the modular pipeline (itself golden-pinned
to the PyTorch reference), so strip-for-strip agreement here transitively
pins the two-pass normalization scheme (per-strip stats merged on the
host, reference rendering/shader.py:34-37,51-54,83-84 semantics) to
reference math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.pipeline import RenderConfig
from ray_marching_tpu.render.tiled import TiledRenderer
from ray_marching_tpu.scene import registry

PX = 3.45e-6


def make_pair(w=96, h=64, strip=20, steps=12, **cfg_kw):
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps, **cfg_kw,
    )
    node = registry.make_scene("test_scene2")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    tr = TiledRenderer(node, cfg, strip_height=strip, dtype=jnp.float64,
                       grid_dtype=np.float64, interpret=True)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    return f, tr, q, t


@pytest.mark.parametrize("mode", range(8))
def test_tiled_matches_full_all_modes(mode):
    """strip=20 over h=64: 4 strips, the last one 4 rows of extrapolated
    grid — exercises the crop and the stats masking."""
    f, tr, q, t = make_pair()
    a = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
    b = tr.render(tr.init_params, q, t, mode=mode, degree=2)
    assert b.shape == a.shape
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)


def test_tiled_dividing_strip_and_single_strip():
    f, tr16, q, t = make_pair(strip=16)
    tr_all = TiledRenderer(registry.make_scene("test_scene2"), f.config,
                           strip_height=999, dtype=jnp.float64,
                           grid_dtype=np.float64, interpret=True)
    assert tr_all.num_strips == 1
    for tr in (tr16, tr_all):
        a = np.asarray(f.render(f.init_params, q, t, mode=1, degree=2))
        b = tr.render(tr.init_params, q, t, mode=1, degree=2)
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11,
                                   equal_nan=True)


@pytest.mark.slow
def test_tiled_tau_and_bounces():
    """Early exit is per-ray and bounces re-march per strip; both must be
    strip-partition-independent. Bounced grazing rays are chaotic (XLA
    fuses the host-side mirror formula differently at strip vs full
    shapes; a 1-ulp direction difference diverges exponentially over the
    re-march — CLAUDE.md chaos rule), so the bounce case allows a small
    fraction of such pixels like the golden harness does."""
    f, tr, q, t = make_pair(strip=24, steps=16, tau=1e-3,
                            reflection_bounces=1)
    for mode in (0, 5):
        a = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
        b = tr.render(tr.init_params, q, t, mode=mode, degree=2)
        close = np.isclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)
        assert (~close).mean() < 0.001, f"mode {mode}: {(~close).mean()}"


@pytest.mark.slow
def test_tiled_multi_camera_matches_full():
    """Multi-camera batches loop (camera, strip) pairs; the whole-image
    normalizations span the full batch like the one-pass renderers —
    image parity with the multi-camera FastRenderer, incl. a normalized
    mode whose bounds must cross cameras."""
    PXS = 3.45e-6
    cfg = RenderConfig(
        num_cameras=2, px_width=64, px_height=40,
        focal_length=PXS * 40, sensor_width=PXS * 64,
        sensor_height=PXS * 40, marching_steps=10,
    )
    node = registry.make_scene("test_scene2")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    tr = TiledRenderer(node, cfg, strip_height=16, dtype=jnp.float64,
                       grid_dtype=np.float64, interpret=True)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0], [0.1, 0.02, 0.99, 0.01]],
                    jnp.float64)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jnp.asarray([[0.0, 0.2, 2.0], [0.2, 0.1, 2.2]], jnp.float64)
    for mode in (0, 1, 3):  # plain, batch-normalized, per-camera vignette
        a = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
        b = tr.render(tr.init_params, q, t, mode=mode, degree=2)
        assert b.shape == (2, 40, 64, 3)
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11,
                                   equal_nan=True, err_msg=f"mode {mode}")
    # gradients accumulate over (camera, strip) pairs too
    rng = np.random.default_rng(9)
    target = jnp.asarray(rng.uniform(0, 1, (2, 40, 64, 3)), jnp.float64)

    def full_loss(params):
        img = f.render(params, q, t, mode=0, degree=2)
        return jnp.sum((jnp.nan_to_num(img, nan=0.0) - target) ** 2) / target.size

    want_l, want_g = jax.value_and_grad(full_loss)(f.init_params)
    got_l, got_g = tr.loss_and_grad(tr.init_params, q, t, target, mode=0,
                                    degree=2)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-12)
    from ray_marching_tpu.scene.graph import param_paths as pp
    for k, v in pp(want_g).items():
        np.testing.assert_allclose(np.asarray(pp(got_g)[k]), np.asarray(v),
                                   rtol=1e-9, atol=1e-12, err_msg=k)


def test_tiled_rejects_bad_strip_height():
    cfg = RenderConfig(px_width=16, px_height=8, marching_steps=4)
    for bad in (0, -5):
        with pytest.raises(ValueError, match="strip_height"):
            TiledRenderer(registry.make_scene("single_sphere"), cfg,
                          strip_height=bad, interpret=True)


def test_cli_render_strip_height(tmp_path):
    from ray_marching_tpu.cli import main

    out = tmp_path / "strip.png"
    main([
        "render", "--cpu", "--scene", "test_scene2", "--mode", "distance",
        "--width", "64", "--height", "40", "--steps", "8",
        "--strip-height", "16", "-o", str(out),
    ])
    from PIL import Image

    with Image.open(out) as im:
        assert im.size == (64, 40)


@pytest.mark.slow
def test_tiled_loss_and_grad_matches_full():
    """Strip-accumulated gradients equal the full-image value_and_grad for
    modes without a whole-image normalization (mode 0: exact, the
    per-strip cotangents just sum); for a normalized mode the LOSS is
    still exact and optimization descends (bounds treated constant)."""
    from ray_marching_tpu.scene.graph import param_paths as pp

    f, tr, q, t = make_pair(strip=20, steps=12)
    rng = np.random.default_rng(5)
    target = jnp.asarray(
        rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float64
    )

    def full_loss(params, mode):
        img = f.render(params, q, t, mode=mode, degree=2)
        err = jnp.nan_to_num(img, nan=0.0) - target
        return jnp.sum(err * err) / target.size

    # mode 0: exact equality of loss and every gradient leaf.
    want_l, want_g = jax.value_and_grad(lambda p: full_loss(p, 0))(
        f.init_params
    )
    got_l, got_g = tr.loss_and_grad(tr.init_params, q, t, target, mode=0,
                                    degree=2)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-12)
    g1, g2 = pp(want_g), pp(got_g)
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g2[k]), np.asarray(g1[k]), rtol=1e-9, atol=1e-12,
            err_msg=k,
        )

    # mode 4 (normal shader, no whole-image normalization): also exact.
    want_l4, want_g4 = jax.value_and_grad(lambda p: full_loss(p, 4))(
        f.init_params
    )
    got_l4, got_g4 = tr.loss_and_grad(tr.init_params, q, t, target, mode=4,
                                      degree=2)
    np.testing.assert_allclose(float(got_l4), float(want_l4), rtol=1e-12)
    for k, v in pp(want_g4).items():
        np.testing.assert_allclose(
            np.asarray(pp(got_g4)[k]), np.asarray(v), rtol=1e-9, atol=1e-12,
            err_msg=k,
        )

    # mode 1 (global min/max): the LOSS is exact. Gradients of the
    # normalized modes are pathological at the arg-extremum pixel in FULL
    # autodiff too (x**(1/2.33) has infinite slope at x=0 → NaN, verified
    # for this exact config) — the reference's own semantics, not a
    # tiling artifact; only loss exactness is contractual here.
    want_l1 = full_loss(f.init_params, 1)
    got_l1, _ = tr.loss_and_grad(tr.init_params, q, t, target, mode=1,
                                 degree=2)
    np.testing.assert_allclose(float(got_l1), float(want_l1), rtol=1e-12)


def test_tiled_render_all_modes_matches_full():
    """Tiled OmniShader: all 8 modes from two marches per strip must equal
    the one-pass render_all_modes image-for-image (1e-11; cmap-gather
    modes allow a tiny fraction of bucket-flip pixels like the fast/modular
    pin does)."""
    f, tr, q, t = make_pair(strip=20, steps=12)
    want = f.render_all_modes(f.init_params, q, t, degree=2)
    got = tr.render_all_modes(tr.init_params, q, t, degree=2)
    assert set(got) == set(want)
    for name in want:
        a = np.asarray(want[name])
        b = got[name]
        close = np.isclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)
        if name in ("tangent", "spin"):
            assert (~close).mean() < 0.005, name
        else:
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11,
                                       equal_nan=True, err_msg=name)


@pytest.mark.slow
def test_tiled_pose_gradients_match_full():
    """with_pose=True: strip-accumulated pose cotangents equal the
    one-pass renderer's (VERDICT r2 #3 — pose-at-8K is a real use case)."""
    f, tr, q, t = make_pair(steps=10)
    rng = np.random.default_rng(5)
    target = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)))

    def full_loss(params, q, t):
        img = f.render(params, q, t, mode=0, degree=2)
        return jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0) - target))

    want_l, (want_g, want_gq, want_gt) = jax.jit(
        jax.value_and_grad(full_loss, argnums=(0, 1, 2))
    )(f.init_params, q, t)
    got_l, (got_g, got_gq, got_gt) = tr.loss_and_grad(
        tr.init_params, q, t, target, mode=0, degree=2, with_pose=True
    )
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got_gq), np.asarray(want_gq),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_gt), np.asarray(want_gt),
                               rtol=1e-8, atol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(got_g),
                    jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)


@pytest.mark.slow
def test_tiled_alpha_loss_matches_full():
    """alpha_target: the strip-accumulated silhouette term equals the
    one-pass render_with_alpha loss and gradient (min_f is per-ray, so
    strips compose exactly)."""
    f, tr, q, t = make_pair(steps=10)
    rng = np.random.default_rng(6)
    target = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)))
    alpha_target = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 1)))

    def full_loss(params):
        img, alpha = f.render_with_alpha(params, q, t, mode=0, degree=2)
        l = jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0) - target))
        return l + 0.5 * jnp.mean(jnp.square(alpha - alpha_target))

    want_l, want_g = jax.jit(jax.value_and_grad(full_loss))(f.init_params)
    got_l, got_g = tr.loss_and_grad(
        tr.init_params, q, t, target, mode=0, degree=2,
        alpha_target=alpha_target, alpha_weight=0.5,
    )
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(got_g),
                    jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)


@pytest.mark.slow
def test_tiled_pluggable_loss():
    """A custom per-pixel loss (L1) routes through the strip accumulation;
    value matches the directly-computed whole-image L1."""
    f, tr, q, t = make_pair(steps=8)
    rng = np.random.default_rng(7)
    target = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)))
    l1 = lambda img, tgt: jnp.abs(jnp.nan_to_num(img, nan=0.0) - tgt)

    got_l, got_g = tr.loss_and_grad(
        tr.init_params, q, t, target, mode=4, degree=2, loss_fn=l1
    )
    img = np.asarray(f.render(f.init_params, q, t, mode=4, degree=2))
    want = np.mean(np.abs(np.nan_to_num(img, nan=0.0) - np.asarray(target)))
    np.testing.assert_allclose(float(got_l), want, rtol=1e-12)
    assert any(
        float(jnp.max(jnp.abs(v))) > 0
        for v in jax.tree_util.tree_leaves(got_g)
    )
