"""Pallas marching kernel: interpret-mode parity with the scan marcher.

On-device (Mosaic-compiled) parity is exercised by bench.py and was verified
bitwise-identical on TPU v5e; these tests run the same kernel through the
Pallas interpreter on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.ops.pallas_march import (
    pallas_march,
    pallas_march_with_distance,
)
from ray_marching_tpu.render.march import march
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import compile_scene, param_paths


def setup(scene="test_scene2", dtype=jnp.float64, shape=(1, 24, 40)):
    sdf_vec, sdf_c, params = compile_scene(registry.make_scene(scene), dtype)
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.uniform(-1, 1, shape + (3,)), dtype)
    v = rng.standard_normal(shape + (3,))
    v = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True), dtype)
    return sdf_vec, sdf_c, params, p0, v


def test_forward_matches_scan_f64():
    sdf_vec, sdf_c, params, p0, v = setup()
    want = np.asarray(march(sdf_vec, params, p0, v, 16))
    got, dist = pallas_march_with_distance(sdf_c, params, p0, v, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(sdf_vec(params, got)), rtol=1e-12, atol=1e-14
    )


def test_forward_matches_scan_smooth_union():
    sdf_vec, sdf_c, params, p0, v = setup("test_scene")
    want = np.asarray(march(sdf_vec, params, p0, v, 12))
    got = pallas_march(sdf_c, params, p0, v, 12, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11, atol=1e-12)


def camera_like_setup(scene="composite", dtype=jnp.float64, shape=(1, 24, 40)):
    """Rays from a plane outside the scene pointing inward — the geometry a
    camera produces, free of the interior knife-edge rays where gradient
    magnitudes blow up and remat reassociation flips chaos into NaN."""
    sdf_vec, sdf_c, params = compile_scene(registry.make_scene(scene), dtype)
    rng = np.random.default_rng(3)
    p0 = np.zeros(shape + (3,))
    p0[..., 0] = rng.uniform(-0.8, 0.8, shape)
    p0[..., 1] = rng.uniform(-0.8, 0.8, shape)
    p0[..., 2] = -3.0
    v = np.zeros(shape + (3,))
    v[..., 2] = 1.0
    return sdf_vec, sdf_c, params, jnp.asarray(p0, dtype), jnp.asarray(v, dtype)


def test_gradients_match_scan():
    sdf_vec, sdf_c, params, p0, v = camera_like_setup()

    def loss_pallas(params):
        pos, dist = pallas_march_with_distance(
            sdf_c, params, p0, v, 24, interpret=True
        )
        return jnp.sum(pos**2) + jnp.sum(dist)

    def loss_scan(params):
        pos = march(sdf_vec, params, p0, v, 24)
        return jnp.sum(pos**2) + jnp.sum(sdf_vec(params, pos))

    g1 = param_paths(jax.grad(loss_pallas)(params))
    g2 = param_paths(jax.grad(loss_scan)(params))
    assert set(g1) == set(g2)
    for k in g2:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-8, atol=1e-12, err_msg=k
        )


def test_early_exit_stays_within_tau():
    sdf_vec, sdf_c, params, p0, v = setup()
    exact = pallas_march(sdf_c, params, p0, v, 32, interpret=True)
    masked = pallas_march(sdf_c, params, p0, v, 32, tau=1e-6, interpret=True)
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(exact), atol=1e-4
    )


def test_odd_ray_counts_pad_correctly():
    # 7*9 = 63 rays — far from any tile multiple.
    sdf_vec, sdf_c, params, p0, v = setup(shape=(7, 9))
    want = np.asarray(march(sdf_vec, params, p0, v, 8))
    got = pallas_march(sdf_c, params, p0, v, 8, interpret=True)
    assert got.shape == (7, 9, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-13)


def test_pipeline_use_pallas_flag():
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig

    px = 3.45e-6
    cfg = RenderConfig(
        px_width=48, px_height=32,
        focal_length=px * 32, sensor_width=px * 48, sensor_height=px * 32,
        marching_steps=8, use_pallas=True,
    )
    import ray_marching_tpu.ops.pallas_march as pm
    # Route the pipeline's pallas path through the interpreter on CPU.
    orig = pm.pallas_march
    pm.pallas_march = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        r = Renderer(registry.make_scene("test_scene2"), cfg, dtype=jnp.float32)
        q, t = r.default_pose()
        img = r.render(r.init_params, q, t, mode=0, degree=1)
        cfg2 = RenderConfig(**{**cfg.__dict__, "use_pallas": False})
        r2 = Renderer(registry.make_scene("test_scene2"), cfg2, dtype=jnp.float32)
        want = r2.render(r2.init_params, q, t, mode=0, degree=1)
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(want), rtol=1e-4, atol=1e-5
        )
    finally:
        pm.pallas_march = orig


def test_mega_kernel_matches_reference_fn():
    """pallas_render._reference_fn is the in-repo jnp spec of the
    mega-kernel's math (march + terminal + normals + laplacian [+ min_f]);
    the kernel must reproduce it plane-for-plane across tau and coverage
    variants. Keeps the spec function honest (it has no production
    caller)."""
    from ray_marching_tpu.ops.pallas_march import split_params_padded
    from ray_marching_tpu.ops.pallas_render import (
        _call_render_kernel,
        _reference_fn,
    )

    _, sdf_c, params, p0, v = setup(dtype=jnp.float64, shape=(256,))
    flat, mats, rebuild = split_params_padded(params, jnp.float64)
    rows = 2
    rays7 = jnp.stack(
        [
            p0[..., 0].reshape(rows, 128),
            p0[..., 1].reshape(rows, 128),
            p0[..., 2].reshape(rows, 128),
            v[..., 0].reshape(rows, 128),
            v[..., 1].reshape(rows, 128),
            v[..., 2].reshape(rows, 128),
            jnp.ones((rows, 128), jnp.float64),
        ],
        axis=0,
    )
    for tau, track_min in [(0.0, False), (0.0, True), (1e-3, False)]:
        got = _call_render_kernel(
            sdf_c, rebuild, flat, mats, rays7, 12, tau, 5e-2, True, track_min
        )
        want = _reference_fn(
            sdf_c, rebuild, 12, tau, 5e-2, flat, mats, rays7,
            track_min=track_min,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-12,
            err_msg=f"tau={tau} track_min={track_min}",
        )


def test_pad_slot_gradients_not_poisoned_by_origin_singularity():
    """Zero-filled ray-plane pads sit at the world origin — a gradient
    singularity for scenes like Affine(Sphere, t=0) or a Line through the
    origin — and the where-mask only zeroes the pad COTANGENT, which
    cannot stop 0·inf = NaN inside the SDF's sqrt VJP from poisoning the
    shared parameter cotangent. Pads are edge-replicated real rays now
    (the mega-kernel's fix); parameter grads must stay finite and equal
    the scan marcher's (CLAUDE.md pad-slot invariant)."""
    from ray_marching_tpu.scene.graph import Affine, Sphere, compile_scene

    node = Affine(Sphere(0.5), (1.0, 0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    sdf_vec, sdf_c, params = compile_scene(node, jnp.float64)
    rng = np.random.default_rng(2)
    n = 300  # NOT a multiple of 1024 -> pad slots exist
    p0 = jnp.asarray(rng.uniform(1.0, 2.0, (n, 3)))
    v = rng.standard_normal((n, 3))
    v = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))

    def loss(marcher, params):
        return jnp.sum(marcher(params, p0, v) ** 2)

    g_pallas = jax.grad(
        lambda p: loss(lambda p_, a, b: pallas_march(
            sdf_c, p_, a, b, 8, interpret=True), p)
    )(params)
    g_scan = jax.grad(
        lambda p: loss(lambda p_, a, b: march(sdf_vec, p_, a, b, 8), p)
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pallas),
                    jax.tree_util.tree_leaves(g_scan)):
        assert np.isfinite(np.asarray(a)).all()
        # atol covers summation-order rounding on the sphere's
        # rotation-invariant orientation leaf (true gradient exactly 0).
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-8)


def test_wide_scene_vmem_scaling():
    """Width-scaled kernel knobs (round 5): wide analytic scenes raise the
    scoped-VMEM budget ~256 KiB per 128-lane param segment (64 leaves =
    192 segments OOM'd the 16 MiB default at 25.09 MiB on v5e) and shrink
    ray tiles past 256/512 segments; small scenes are untouched."""
    from ray_marching_tpu.ops.pallas_march import (
        _tile_rows,
        wide_vmem_bytes,
    )

    assert wide_vmem_bytes(128) == 0          # tiny scene: default budget
    assert wide_vmem_bytes(64 * 128) == 0     # 64 segments: still default
    assert wide_vmem_bytes(192 * 128) == 192 * 256 * 1024  # 64 leaves
    assert wide_vmem_bytes(10**6) == 100 * 2**20           # capped
    assert _tile_rows(16200, segs=192) == 64  # 64-leaf fwd tile unchanged
    assert _tile_rows(16200, segs=384) == 32  # 128 leaves
    assert _tile_rows(16200, segs=600) == 16
