"""Mesh construction and sharded render/train steps.

Idiomatic JAX SPMD: build a ``Mesh`` over the devices, annotate the ray-grid
shardings with ``NamedSharding``/``with_sharding_constraint`` under ``jit``,
and let XLA insert the collectives — the global min/max shader reductions
become cross-device reduces and the scene-parameter gradients (replicated
params) are all-reduced automatically. ICI carries the intra-slice axes; on
multi-host pods initialize ``jax.distributed`` first and put the host axis
on DCN (axis order in ``make_mesh`` puts 'host' first, which maps to the
outer/DCN dimension).

Axes:
  * ``dp``   — cameras / batch (data parallel)
  * ``rows`` — image rows (the spatial / "sequence" axis of this workload)
  * ``cols`` — image columns (optional second spatial axis)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("rows", "cols"),
              devices=None) -> Mesh:
    """Build a device mesh.

    Defaults to a 1-D ('rows',)-if-2-devices … heuristic: with no shape
    given, all devices go on the first axis and the rest are size-1.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def ray_partition_spec(mesh: Mesh) -> P:
    """PartitionSpec for (N, H, W, 3) ray arrays: dp over cameras (if the
    mesh has a 'dp' axis), rows/cols over the image."""
    names = mesh.axis_names
    return P(
        "dp" if "dp" in names else None,
        "rows" if "rows" in names else None,
        "cols" if "cols" in names else None,
        None,
    )


def shard_render(renderer, mesh: Mesh, *, mode: int = 0, degree: int = 1,
                 marching_steps: Optional[int] = None):
    """A jitted render step with rays sharded over ``mesh`` and scene
    parameters replicated.

    Sharding is introduced by constraining the posed ray grid; XLA
    propagates it through the march (elementwise per ray) and inserts the
    collectives for the shaders' global min/max normalizations.
    """
    spec = ray_partition_spec(mesh)
    sharding = NamedSharding(mesh, spec)
    replicated = NamedSharding(mesh, P())

    def render_fn(params, orientation, translation):
        # Constrain the camera constants' world-space pose to the ray
        # sharding; everything downstream (march, normals, shading)
        # inherits it.
        cam = renderer.camera
        ray_positions = jax.lax.with_sharding_constraint(
            jnp.broadcast_to(cam.ray_positions, cam.ray_positions.shape), sharding
        )
        ray_directions = jax.lax.with_sharding_constraint(
            jnp.broadcast_to(cam.ray_directions, cam.ray_directions.shape), sharding
        )
        # Pose the constrained constants (the pure Camera.pose math), then
        # delegate the march/normals/shade body to the renderer itself so
        # every config flag (use_autodiff_normals, cmap_fourier, tau,
        # bounces) stays in one place — the inline copy this replaced had
        # already drifted on two of them.
        from ray_marching_tpu import quat

        q = orientation[:, None, None, :]
        world_pos = quat.rotation(ray_positions, q) + translation[:, None, None, :]
        world_dir = quat.rotation(ray_directions, q)
        frames = quat.to_so3(orientation)

        image = renderer.render_from_rays(
            params, orientation, world_pos, frames, world_pos, world_dir,
            mode=mode, degree=degree, marching_steps=marching_steps,
        )
        return jax.lax.with_sharding_constraint(image, sharding)

    return jax.jit(
        render_fn,
        in_shardings=(replicated, replicated, replicated),
        out_shardings=sharding,
    )


def make_train_step(renderer, mesh: Mesh, optimizer, *, mode: int = 0,
                    degree: int = 1, marching_steps: Optional[int] = None):
    """A jitted inverse-rendering train step over a sharded pixel loss.

    ``(params, opt_state, target, orientation, translation) ->
    (params, opt_state, loss)`` with the target image sharded like the rays
    and the scene-parameter gradients all-reduced by XLA (params are
    replicated, so the grad reduction is automatic).
    """
    spec = ray_partition_spec(mesh)
    sharding = NamedSharding(mesh, spec)
    replicated = NamedSharding(mesh, P())
    render_inner = shard_render(
        renderer, mesh, mode=mode, degree=degree, marching_steps=marching_steps
    )

    def loss_fn(params, target, orientation, translation):
        image = render_inner(params, orientation, translation)
        return jnp.mean((image - target) ** 2)

    def step(params, opt_state, target, orientation, translation):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, target, orientation, translation
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(replicated, replicated, sharding, replicated, replicated),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(1,),
    )
