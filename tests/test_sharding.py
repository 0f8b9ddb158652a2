"""Sharded rendering/training on the virtual 8-device CPU mesh.

Exercises the multi-chip path the driver dry-runs: rays sharded over a 2D
('rows','cols') mesh, scene params replicated, grads all-reduced, the
shaders' global min/max reductions crossing shard boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ray_marching_tpu.parallel.sharding import make_mesh, make_train_step, shard_render
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry

PX_SIZE = 3.45e-6


def make_renderer(w=32, h=16, steps=8, dtype=jnp.float32):
    cfg = RenderConfig(
        px_width=w,
        px_height=h,
        focal_length=PX_SIZE * h,
        sensor_width=PX_SIZE * w,
        sensor_height=PX_SIZE * h,
        marching_steps=steps,
    )
    return Renderer(registry.make_scene("test_scene2"), cfg, dtype=dtype)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((2, 4), ("rows", "cols"))


@pytest.mark.parametrize("mode", [0, 1, 5])
def test_sharded_render_matches_single_device(mesh, mode):
    """Sharding must not change pixels — including the global min/max
    normalization modes (1, 5), whose reductions cross shards."""
    r = make_renderer()
    q, t = r.default_pose()
    want = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=2))
    fn = shard_render(r, mesh, mode=mode, degree=2)
    got = np.asarray(fn(r.init_params, q, t))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_sharded_output_layout(mesh):
    r = make_renderer()
    q, t = r.default_pose()
    fn = shard_render(r, mesh, mode=0)
    out = fn(r.init_params, q, t)
    assert out.shape == (1, 16, 32, 3)
    # Output actually lives sharded across the mesh.
    assert len(out.sharding.device_set) == 8


def test_sharded_train_step_improves_loss(mesh):
    r = make_renderer()
    # Look towards the origin (180° about y) so the sphere is in view.
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    # Target: render with a perturbed sphere radius, then recover it.
    target_params = jax.tree.map(lambda x: x, r.init_params)
    target_params["c1"]["c0"]["radius"] = jnp.asarray(0.7, jnp.float32)
    target = r.render(target_params, q, t, mode=0, degree=2)

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(r.init_params)
    step = make_train_step(r, mesh, optimizer, mode=0, degree=2)

    params = r.init_params
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, target, q, t)
        losses.append(float(loss))
    assert min(losses[5:]) < losses[0], losses
    # Radius should move towards 0.7 from 0.5.
    assert float(params["c1"]["c0"]["radius"]) > 0.55


def test_gradients_match_unsharded(mesh):
    r = make_renderer()
    q, t = r.default_pose()
    target = jnp.zeros((1, 16, 32, 3), jnp.float32)

    def loss_local(params):
        image = r.render(params, q, t, mode=0, degree=2)
        return jnp.mean((image - target) ** 2)

    g_local = jax.grad(loss_local)(r.init_params)

    fn = shard_render(r, mesh, mode=0, degree=2)

    def loss_sharded(params):
        image = fn(params, q, t)
        return jnp.mean((image - target) ** 2)

    g_sharded = jax.grad(loss_sharded)(r.init_params)
    local = {str(p): a for p, a in jax.tree_util.tree_leaves_with_path(g_local)}
    sharded = {str(p): a for p, a in jax.tree_util.tree_leaves_with_path(g_sharded)}
    assert set(local) == set(sharded)
    for path in local:
        np.testing.assert_allclose(
            np.asarray(local[path]),
            np.asarray(sharded[path]),
            rtol=2e-4,
            atol=1e-6,
            err_msg=path,
        )


def test_shard_render_honors_config_flags():
    """shard_render must not drift from Renderer.render: autodiff normals
    and the Fourier colourmap are config flags the (now-deleted) inline
    copy silently dropped. Pixel parity with the unsharded render under
    both flags, and an explicit marching_steps=0 is honored (not replaced
    by the config value through a falsy-or)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from ray_marching_tpu.parallel.sharding import make_mesh, shard_render

    cfg = RenderConfig(
        px_width=64, px_height=32,
        focal_length=PX_SIZE * 32, sensor_width=PX_SIZE * 64,
        sensor_height=PX_SIZE * 32,
        marching_steps=8, use_autodiff_normals=True, cmap_fourier=True,
    )
    r = Renderer(registry.make_scene("test_scene2"), cfg, dtype=jnp.float64,
                 grid_dtype=np.float64)
    mesh = make_mesh((8, 1), ("rows", "cols"))
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.2, 2.5]], jnp.float64)
    for mode in (0, 6):  # lambertian (normals path), tangent (cmap path)
        a = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=2))
        b = np.asarray(
            shard_render(r, mesh, mode=mode, degree=2)(r.init_params, q, t)
        )
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11,
                                   equal_nan=True, err_msg=f"mode {mode}")
    a0 = np.asarray(r.render(r.init_params, q, t, mode=0, marching_steps=0))
    b0 = np.asarray(
        shard_render(r, mesh, mode=0, marching_steps=0)(r.init_params, q, t)
    )
    np.testing.assert_allclose(a0, b0, rtol=1e-9, atol=1e-11, equal_nan=True)
