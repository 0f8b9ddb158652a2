"""Sharded fused-kernel (FastRenderer) path: pixel + gradient parity vs the
single-device fast renderer on the virtual 8-device CPU mesh.

The global shader normalizations run as explicit lax.pmin/pmax inside
shard_map (reference rendering/shader.py:34-37,51-54,83-84 under sharding);
scene-parameter cotangents from every row shard are psum-reduced by
shard_map's transpose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ray_marching_tpu.parallel import fast_sharding as fs
from ray_marching_tpu.parallel.sharding import make_mesh
from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.pipeline import RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import param_paths

PX = 3.45e-6


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(
        px_width=96, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 96, sensor_height=PX * 64,
        marching_steps=12,
    )
    node = registry.make_scene("test_scene2")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True, row_multiple=64)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    return f, q, t


@pytest.mark.parametrize("mode", range(8))
def test_sharded_fast_matches_single_device(setup, mode):
    f, q, t = setup
    mesh = make_mesh((8,), ("rays",))
    a = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
    render = fs.fast_shard_render(f, mesh, mode=mode, degree=2)
    b = np.asarray(render(f.init_params, q, t))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-11, equal_nan=True)


def test_sharded_fast_2d_mesh(setup):
    f, q, t = setup
    mesh = make_mesh((2, 4), ("host", "chip"))
    a = np.asarray(f.render(f.init_params, q, t, mode=2, degree=1))
    render = fs.fast_shard_render(f, mesh, mode=2, degree=1)
    b = np.asarray(render(f.init_params, q, t))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-11)


def test_sharded_fast_gradients_match(setup):
    """The plane-space sharded loss equals the image-space single-device
    loss, and every scene-parameter gradient agrees (psum'd cotangents)."""
    f, q, t = setup
    mesh = make_mesh((2, 4), ("host", "chip"))
    true = jax.tree.map(lambda x: x, f.init_params)
    true["c1"]["c0"]["radius"] = jnp.asarray(0.65, jnp.float64)
    target_img = f.render(true, q, t, mode=0, degree=1)
    tp = fs.target_planes(f, mesh, target_img)

    def loss_sd(p):
        img = f.render(p, q, t, mode=0, degree=1)
        return jnp.mean((img - target_img) ** 2)

    chan = fs.make_channel_fn(f, mesh, mode=0, degree=1)

    def loss_sh(p):
        ch = chan(p, q, t)
        err = (ch - tp) * f._valid[None]
        return jnp.sum(err * err) / (f.total * 3)

    l0, g0 = jax.value_and_grad(loss_sd)(f.init_params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_sh))(f.init_params)
    assert abs(float(l0) - float(l1)) < 1e-15
    p0, p1 = param_paths(g0), param_paths(g1)
    assert set(p0) == set(p1)
    for k in p0:
        np.testing.assert_allclose(
            np.asarray(p0[k]), np.asarray(p1[k]), rtol=1e-9, atol=1e-12,
            err_msg=k,
        )


@pytest.mark.parametrize("mode", [1, 2, 5])
def test_sharded_fast_gradients_normalized_modes(setup, mode):
    """Modes with whole-image min/max normalizations must be differentiable
    under shard_map: lax.pmin/pmax carry no VJP rule, so the collectives run
    through utils.prmin/prmax (psum'd cotangent split over ALL global
    arg-extremum ties — the clamp(·, 1e-2) floor makes cross-shard ties
    routine). Gradients must equal the single-device fast path exactly."""
    f, q, t = setup
    mesh = make_mesh((2, 4), ("host", "chip"))
    rng = np.random.default_rng(mode)
    h, w = f.config.px_height, f.config.px_width
    w_img = jnp.asarray(rng.standard_normal((1, h, w, 3)))
    wp = f.image_to_planes(w_img)
    chan = fs.make_channel_fn(f, mesh, mode=mode, degree=1)

    def loss_sh(p):
        return jnp.sum(jnp.nan_to_num(chan(p, q, t) * wp, nan=0.0))

    def loss_sd(p):
        img = f.render(p, q, t, mode=mode, degree=1)
        return jnp.sum(jnp.nan_to_num(img * w_img, nan=0.0))

    l0, g0 = jax.value_and_grad(loss_sd)(f.init_params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_sh))(f.init_params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-12)
    p0, p1 = param_paths(g0), param_paths(g1)
    assert set(p0) == set(p1)
    for k in p0:
        np.testing.assert_allclose(
            np.asarray(p0[k]), np.asarray(p1[k]), rtol=1e-9, atol=1e-12,
            err_msg=k,
        )


def test_sharded_fast_train_step_recovers_radius(setup):
    """BASELINE config 4 on the sharded fused path: the train step descends
    and moves the perturbed radius toward truth."""
    f, q, t = setup
    mesh = make_mesh((8,), ("rays",))
    true = jax.tree.map(lambda x: x, f.init_params)
    true["c1"]["c0"]["radius"] = jnp.asarray(0.65, jnp.float64)
    target_img = f.render(true, q, t, mode=0, degree=1)
    tp = fs.target_planes(f, mesh, target_img)

    opt = optax.adam(2e-2)
    step = fs.fast_train_step(f, mesh, opt, mode=0, degree=1)
    params, opt_state = f.init_params, opt.init(f.init_params)
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, tp, q, t)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.75
    r0 = float(f.init_params["c1"]["c0"]["radius"])
    assert abs(float(params["c1"]["c0"]["radius"]) - 0.65) < abs(r0 - 0.65)


def test_row_multiple_validation():
    cfg = RenderConfig(px_width=16, px_height=8, marching_steps=4)
    f = FastRenderer(registry.make_scene("single_sphere"), cfg,
                     interpret=True)
    mesh = make_mesh((8,), ("rays",))
    with pytest.raises(ValueError, match="row_multiple"):
        fs.make_channel_fn(f, mesh)


def test_sharded_render_with_alpha_matches_single_device(setup):
    """Coverage is per-ray — the sharded alpha must equal the single-device
    fast render_with_alpha bit-for-tolerance, image included."""
    f, q, t = setup
    mesh = make_mesh((8,), ("rays",))
    ia, aa = f.render_with_alpha(f.init_params, q, t, mode=0, beta=0.05)
    render = fs.fast_shard_render_with_alpha(f, mesh, mode=0, beta=0.05)
    ib, ab = render(f.init_params, q, t)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib),
                               rtol=1e-10, atol=1e-11, equal_nan=True)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ab),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_sharded_silhouette_train_step_descends(setup):
    """The silhouette-aware sharded train step reproduces optimize()'s
    composite+mask objective and descends on the fused path."""
    from ray_marching_tpu.render.silhouette import composite

    f, q, t = setup
    beta = 0.05
    mesh = make_mesh((2, 4), ("host", "chip"))
    true = jax.tree.map(lambda x: x, f.init_params)
    true["c1"]["c0"]["radius"] = jnp.asarray(0.65, jnp.float64)
    img_t, a_t = f.render_with_alpha(true, q, t, mode=0, beta=beta)
    tp = fs.target_planes(f, mesh, composite(img_t, a_t))
    tap = fs.target_planes(f, mesh, a_t)

    # The plane-space sharded loss must equal the image-space objective.
    chan = fs.make_channel_fn(f, mesh, mode=0, with_alpha=True, beta=beta)

    def loss_sh(p):
        ch = chan(p, q, t)
        comp = ch[3][None] * ch[:3]
        err = (comp - tp) * f._valid[None]
        aerr = (ch[3] - tap[0]) * f._valid
        return jnp.sum(err * err) / (f.total * 3) + jnp.sum(aerr * aerr) / f.total

    def loss_sd(p):
        img, a = f.render_with_alpha(p, q, t, mode=0, beta=beta)
        return (
            jnp.mean((composite(img, a) - composite(img_t, a_t)) ** 2)
            + jnp.mean((a - a_t) ** 2)
        )

    l0, g0 = jax.value_and_grad(loss_sd)(f.init_params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_sh))(f.init_params)
    assert abs(float(l0) - float(l1)) < 1e-14
    from ray_marching_tpu.scene.graph import param_paths
    p0, p1 = param_paths(g0), param_paths(g1)
    for k in p0:
        np.testing.assert_allclose(
            np.asarray(p0[k]), np.asarray(p1[k]), rtol=1e-9, atol=1e-12,
            err_msg=k,
        )

    opt = optax.adam(2e-2)
    step = fs.fast_train_step_silhouette(f, mesh, opt, mode=0, beta=beta)
    params, opt_state = f.init_params, opt.init(f.init_params)
    losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state, tp, tap, q, t)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.75


@pytest.mark.slow
def test_multi_camera_sharded_matches_local():
    """Two cameras over 8 devices (4 row shards per camera): sharded pixels
    equal the unsharded fast render on every mode class (incl. the
    orientation-dependent vignette/tangent/spin, which recover their
    camera's pose from the mesh position), and parameter + pose gradients
    match (the pose cotangent routes through the dynamic slice's
    scatter-add transpose and the shard psum)."""
    cfg = RenderConfig(
        num_cameras=2, px_width=48, px_height=32,
        focal_length=PX * 32, sensor_width=PX * 48, sensor_height=PX * 32,
        marching_steps=8,
    )
    node = registry.make_scene("test_scene2")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True, row_multiple=8 * 8 // 2)
    mesh = make_mesh((8,), ("rays",))
    q = jnp.asarray(
        [[0.0, 0.0, 1.0, 0.0], [0.1, 0.02, 0.99, 0.01]], jnp.float64
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jnp.asarray([[0.0, 0.2, 2.0], [0.2, 0.1, 2.2]], jnp.float64)

    for mode in (0, 1, 3, 6, 7):
        rs = fs.fast_shard_render(f, mesh, mode=mode, degree=2)
        a = np.asarray(rs(f.init_params, q, t))
        b = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
        assert a.shape == b.shape == (2, 32, 48, 3)
        close = np.isclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)
        # tangent/spin may flip a few floor()-boundary colourmap indices.
        limit = 0.005 if mode in (6, 7) else 0.0
        assert (~close).mean() <= limit, f"mode {mode}"

    rng = np.random.default_rng(1)
    w_img = jnp.asarray(rng.standard_normal((2, 32, 48, 3)))
    chan = fs.make_channel_fn(f, mesh, mode=0, degree=2)
    tp = f.image_to_planes(w_img)

    def loss_sharded(params, q, t):
        return jnp.sum(chan(params, q, t) * tp)

    def loss_local(params, q, t):
        return jnp.sum(f.render(params, q, t, mode=0, degree=2) * w_img)

    g1 = jax.grad(loss_sharded, argnums=(0, 1, 2))(f.init_params, q, t)
    g2 = jax.grad(loss_local, argnums=(0, 1, 2))(f.init_params, q, t)
    p1, p2 = param_paths(g1[0]), param_paths(g2[0])
    assert set(p1) == set(p2)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-6, atol=1e-10,
            err_msg=k,
        )
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g2[2]),
                               rtol=1e-6, atol=1e-10)


def test_multi_camera_sharded_rejects_bad_device_count():
    cfg = RenderConfig(
        num_cameras=3, px_width=16, px_height=16,
        focal_length=PX * 16, sensor_width=PX * 16, sensor_height=PX * 16,
        marching_steps=4,
    )
    f = FastRenderer(registry.make_scene("test_scene2"), cfg,
                     dtype=jnp.float64, interpret=True)
    mesh = make_mesh((8,), ("rays",))
    with pytest.raises(ValueError, match="multiple of the camera count"):
        fs.fast_shard_render(f, mesh, mode=0)


def test_sharded_fast_tau_early_exit_matches_single_device():
    """tau > 0 under shard_map: the per-tile segment-cadence exit and the
    tau history handoff are per-shard-local (tile partitioning changes with
    the shard size but frozen rays re-evaluate unchanged positions, so
    values are partition-independent); render and train must match the
    single-device fast path. f64 keeps divergent-ray chaos out of the
    comparison."""
    cfg = RenderConfig(
        px_width=96, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 96, sensor_height=PX * 64,
        marching_steps=16, tau=1e-3,
    )
    f = FastRenderer(registry.make_scene("test_scene2"), cfg,
                     dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True, row_multiple=64)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    mesh = make_mesh((8,), ("rays",))
    for mode in (0, 1):
        sharded = np.asarray(
            fs.fast_shard_render(f, mesh, mode=mode, degree=2)(
                f.init_params, q, t
            )
        )
        local = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
        np.testing.assert_allclose(sharded, local, rtol=1e-9, atol=1e-11,
                                   equal_nan=True, err_msg=f"mode {mode}")

    # Gradients through the sharded fused backward with the tau freeze mask.
    opt = optax.adam(1e-2)
    step = fs.fast_train_step(f, mesh, opt, mode=0, degree=2)
    tgt = fs.target_planes(
        f, mesh, f.render(f.init_params, q, t, mode=0, degree=2) * 0.9
    )
    params, _, loss = step(f.init_params, opt.init(f.init_params), tgt, q, t)
    assert np.isfinite(float(loss))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(f.init_params),
        )
    )
    assert moved


def test_sharded_xla_march_matches_single_device():
    """march_impl='xla' under shard_map (VERDICT r3 #3): the XLA-native
    march used for matmul-dominated (NeuralSDF) scenes must produce the
    same pixels AND the same psum'd parameter/pose gradients sharded as
    the single-device fast path. The fused-Pallas neural path keeps its
    own sharded coverage in dryrun_multichip leg 3 (march_impl='fused')."""
    from ray_marching_tpu.scene.neural import NeuralSDF

    cfg = RenderConfig(
        px_width=96, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 96, sensor_height=PX * 64,
        marching_steps=8,
    )
    node = NeuralSDF(hidden=(16, 16), seed=3, impl="matmul")
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True, row_multiple=64)
    assert f.march_impl == "xla"  # auto-dispatch routes matmul scenes here
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    mesh = make_mesh((8,), ("rays",))

    for mode in (0, 4):
        a = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=1))
        b = np.asarray(
            fs.fast_shard_render(f, mesh, mode=mode, degree=1)(
                f.init_params, q, t
            )
        )
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-11,
                                   equal_nan=True, err_msg=f"mode {mode}")

    rng = np.random.default_rng(7)
    w_img = jnp.asarray(rng.standard_normal((1, 64, 96, 3)))
    wp = f.image_to_planes(w_img)
    chan = fs.make_channel_fn(f, mesh, mode=0, degree=1)

    def loss_sh(p, q, t):
        return jnp.sum(jnp.nan_to_num(chan(p, q, t) * wp, nan=0.0))

    def loss_sd(p, q, t):
        img = f.render(p, q, t, mode=0, degree=1)
        return jnp.sum(jnp.nan_to_num(img * w_img, nan=0.0))

    g0 = jax.grad(loss_sd, argnums=(0, 1, 2))(f.init_params, q, t)
    g1 = jax.jit(jax.grad(loss_sh, argnums=(0, 1, 2)))(f.init_params, q, t)
    p0, p1 = param_paths(g0[0]), param_paths(g1[0])
    assert set(p0) == set(p1)
    for k in p0:
        np.testing.assert_allclose(
            np.asarray(p0[k]), np.asarray(p1[k]), rtol=1e-9, atol=1e-12,
            err_msg=k,
        )
    for a, b in zip(g0[1:], g1[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


# -- sharded × tiled composition ---------------------------------------------


def _tiled_pair(mesh, strip=20, steps=10, mode=1):
    from ray_marching_tpu.render.tiled import TiledRenderer

    cfg = RenderConfig(
        px_width=96, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 96, sensor_height=PX * 64,
        marching_steps=steps,
    )
    node = registry.make_scene("test_scene2")
    tr = TiledRenderer(node, cfg, strip_height=strip, dtype=jnp.float64,
                       grid_dtype=np.float64, interpret=True)
    trm = TiledRenderer(node, cfg, strip_height=strip, dtype=jnp.float64,
                        grid_dtype=np.float64, interpret=True, mesh=mesh)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    return tr, trm, q, t


@pytest.mark.parametrize("mode", [0, 1, 5])
def test_tiled_sharded_strips_match_single_device(mode):
    """Sharded × tiled (VERDICT r2 #7): every strip row-sharded over the
    8-device mesh — wall-size frames use every chip. Pixel equality with
    the unsharded tiled renderer (incl. the two-pass normalized modes,
    whose per-strip stats become pmin/pmax collectives)."""
    mesh = make_mesh((8,), ("rays",))
    tr, trm, q, t = _tiled_pair(mesh)
    a = tr.render(tr.init_params, q, t, mode=mode, degree=2)
    b = trm.render(trm.init_params, q, t, mode=mode, degree=2)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-11, equal_nan=True)


@pytest.mark.slow
def test_tiled_sharded_gradients_match_single_device():
    """Strip-accumulated params+pose gradients agree between the sharded
    and unsharded tiled paths (shard_map transpose psums the replicated
    cotangents)."""
    mesh = make_mesh((2, 4), ("host", "chip"))
    tr, trm, q, t = _tiled_pair(mesh, steps=8, mode=0)
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)))
    la, ga = tr.loss_and_grad(tr.init_params, q, t, target, mode=0,
                              degree=2, with_pose=True)
    lb, gb = trm.loss_and_grad(trm.init_params, q, t, target, mode=0,
                               degree=2, with_pose=True)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)
