"""Explicit-collective shader path: the ``axis_names`` branch of the
distance/proximity/laplacian shaders (lax.pmin/pmax inside shard_map) —
shipped untested in round 1 — must reproduce the single-device whole-image
normalizations (reference rendering/shader.py:34-37,51-54,83-84)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ray_marching_tpu.parallel.sharding import make_mesh
from ray_marching_tpu.render import march as march_mod
from ray_marching_tpu.render import shaders
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry

PX = 3.45e-6


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(
        px_width=64, px_height=64,
        focal_length=PX * 64, sensor_width=PX * 64, sensor_height=PX * 64,
        marching_steps=16,
    )
    r = Renderer(registry.make_scene("test_scene2"), cfg, dtype=jnp.float64,
                 grid_dtype=np.float64)
    q = jnp.asarray([[0.1, 0.03, 0.99, 0.03]], jnp.float64)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([[0.1, 0.2, 2.0]], jnp.float64)
    return r, q, t


# Modes with whole-image reductions, plus lambertian as a no-collective
# control.
@pytest.mark.parametrize("mode", [0, 1, 2, 5])
def test_axis_names_branch_matches_single_device(setup, mode):
    r, q, t = setup
    mesh = make_mesh((8,), ("rows",))
    steps = r.config.marching_steps
    pixel_pos, frames, ray_pos, ray_dirs = r.camera.pose(q, t)

    def local(params, pixel_pos, ray_pos, ray_dirs):
        surface_coords = march_mod.march(
            r.sdf_vec, params, ray_pos, ray_dirs, steps
        )
        dists = r.sdf_vec(params, surface_coords)
        normals, lap = r.normals(r.sdf_vec, params, surface_coords)
        img = shaders.shade(
            mode,
            px_coords=pixel_pos,
            camera_orientation=q,
            pixel_frames=frames,
            ray_directions=ray_dirs,
            surface_coords=surface_coords,
            surface_normals=normals,
            surface_laplacian=lap,
            surface_distances=dists,
            cyclic_cmap=r.cyclic_cmap,
            degree=1,
            axis_names=("rows",),
        )
        return jnp.broadcast_to(
            img, img.shape[:3] + (3,)
        )

    row_spec = P(None, "rows", None, None)
    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), row_spec, row_spec, row_spec),
        out_specs=row_spec,
    ))
    b = np.asarray(sharded(r.init_params, pixel_pos, ray_pos, ray_dirs))
    a = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=1))
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14, equal_nan=True)

    # The branch must stay differentiable (lax.pmin/pmax have no VJP rule;
    # the collectives run through utils.prmin/prmax) with gradients equal
    # to the single-device whole-image reductions — global tie splitting
    # included (the clamp(·, 1e-2) floor ties across shards).
    rng = np.random.default_rng(mode)
    w_img = jnp.asarray(rng.standard_normal(a.shape[:3] + (1,)))

    def loss_sh(params):
        img = sharded(params, pixel_pos, ray_pos, ray_dirs)[..., :1]
        return jnp.sum(jnp.nan_to_num(img * w_img, nan=0.0))

    def loss_sd(params):
        img = r.render(params, q, t, mode=mode, degree=1)[..., :1]
        return jnp.sum(jnp.nan_to_num(img * w_img, nan=0.0))

    g0 = jax.grad(loss_sd)(r.init_params)
    g1 = jax.jit(jax.grad(loss_sh))(r.init_params)
    flat0, _ = jax.tree.flatten(g0)
    flat1, _ = jax.tree.flatten(g1)
    for x0, x1 in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                                   rtol=1e-9, atol=1e-12)
