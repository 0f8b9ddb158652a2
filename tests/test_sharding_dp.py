"""Data-parallel (camera) axis sharding: dp × rows mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.parallel.sharding import make_mesh, shard_render
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry

PX = 3.45e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_rows_mesh_matches_single_device():
    cfg = RenderConfig(
        num_cameras=2, px_width=32, px_height=16,
        focal_length=PX * 16, sensor_width=PX * 32, sensor_height=PX * 16,
        marching_steps=8,
    )
    r = Renderer(registry.make_scene("test_scene2"), cfg, dtype=jnp.float32)
    q = jnp.asarray(
        [[0.0, 0.0, 1.0, 0.0], [0.1, 0.0, 0.995, 0.0]], jnp.float32
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jnp.asarray([[0.0, 0.2, 2.0], [0.1, 0.1, 2.2]], jnp.float32)

    want = np.asarray(r.render(r.init_params, q, t, mode=0, degree=1))
    mesh = make_mesh((2, 4), ("dp", "rows"))
    fn = shard_render(r, mesh, mode=0, degree=1)
    got = np.asarray(fn(r.init_params, q, t))
    assert got.shape == (2, 16, 32, 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
