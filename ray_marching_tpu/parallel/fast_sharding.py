"""Sharded fast-path rendering: the fused Pallas mega-kernel under a mesh.

Round 1 left the flagship fused-kernel renderer single-device only — the
sharded render/train steps drove the modular pipeline. Here the
:class:`~ray_marching_tpu.render.fast.FastRenderer` runs under
``jax.shard_map``: each device marches its row shard of the SoA coordinate
planes through the fused kernel (VMEM-resident march + normals), the
shaders' whole-image min/max normalizations (reference
rendering/shader.py:34-37,51-54,83-84) become explicit ``lax.pmin`` /
``lax.pmax`` over the mesh axes, scene parameters are replicated, and the
fused backward's per-shard parameter cotangent is all-reduced by
``shard_map``'s transpose (a ``psum`` — replicated-in ⇒ summed cotangent).

Layout: the (rows, 128) planes shard their row dimension over *all* mesh
axes jointly (``PartitionSpec(mesh.axis_names)``) — the march is
communication-free per ray, so any mesh factorization works; on pods put
'host' first so the outer axis rides DCN and rays never cross it except in
the four scalar collectives per frame (min, max, psum·2).

Multi-camera batches shard too: cameras stack along plane rows, the device
count must be a multiple of the camera count so each row shard belongs to
exactly one camera (its index is recovered from the mesh position inside
``shard_map``, and orientation/translation gradients route back through the
dynamic slice's scatter-add transpose + the psum). The batch-wide shader
normalizations still span all cameras via the same pmin/pmax collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _plane_specs(mesh: Mesh):
    axes = tuple(mesh.axis_names)
    return axes, P(axes, None), P(None, axes, None)


def _check_rows(fast, mesh: Mesh):
    nd = mesh.devices.size
    if nd % fast.num_cameras:
        raise ValueError(
            f"{fast.num_cameras} cameras over {nd} devices: the device "
            "count must be a multiple of the camera count (each row shard "
            "belongs to exactly one camera)"
        )
    per_cam = nd // fast.num_cameras
    if fast.rows_per_cam % (8 * per_cam):
        raise ValueError(
            f"rows_per_cam={fast.rows_per_cam} not divisible by "
            f"8×{per_cam} shards per camera; construct "
            f"FastRenderer(..., row_multiple={8 * per_cam})"
        )


def make_channel_fn(fast, mesh: Mesh, *, mode: int = 0, degree: int = 1,
                    marching_steps: Optional[int] = None,
                    with_alpha: bool = False, beta: Optional[float] = None):
    """The un-jitted sharded channels function:
    ``(params, orientation, translation) -> (3, rows, 128)`` RGB planes,
    row-sharded over the mesh. Differentiable (params cotangent psum'd by
    shard_map's transpose). With ``with_alpha`` a 4th plane carries the
    soft silhouette coverage (min_f rides the mega-kernel, its cotangent
    is routed in the fused backward — entirely per-ray, so sharding needs
    no extra collectives)."""
    _check_rows(fast, mesh)
    axes, plane_spec, chan_spec = _plane_specs(mesh)
    steps = marching_steps or fast.config.marching_steps
    beta = fast.config.silhouette_beta if beta is None else beta

    nd = mesh.devices.size
    shards_per_cam = nd // fast.num_cameras

    def local(params, orientation, translation,
              p0x, p0y, p0z, d0x, d0y, d0z, valid):
        # Which camera does this row shard belong to? Shards are laid out
        # row-major over the mesh axes, cameras stack along rows, and
        # _check_rows guarantees whole-camera shard groups.
        idx = jnp.int32(0)
        for ax in mesh.axis_names:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        cam = idx // shards_per_cam
        q = jax.lax.dynamic_slice_in_dim(orientation, cam, 1, axis=0)
        t = jax.lax.dynamic_slice_in_dim(translation, cam, 1, axis=0)
        from ray_marching_tpu.render.fast import pose_plane_group

        origin, dirs = pose_plane_group(
            q, t, (p0x, p0y, p0z), (d0x, d0y, d0z)
        )
        if with_alpha:
            from ray_marching_tpu.render.silhouette import soft_coverage

            hit, final_dirs, minf = fast._march_planes(
                params, origin, dirs, steps, valid=valid, with_closest=True
            )
        else:
            hit, final_dirs = fast._march_planes(
                params, origin, dirs, steps, valid=valid
            )
        channels = fast._shade(
            mode, degree, q, origin, final_dirs, hit,
            valid_b=valid > 0.5, axis_names=axes, cameras=1, params=params,
        )
        if with_alpha:
            channels = list(channels) + [soft_coverage(minf, beta)]
        return jnp.stack(channels, axis=0)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the checker requires. The transpose semantics are
    # unchanged — replicated-in params still psum their cotangents.
    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P()) + (plane_spec,) * 7,
        out_specs=chan_spec,
        check_vma=False,
    )

    # The baked camera-frame planes are per-camera (rows_per_cam rows);
    # the sharded row axis spans the whole camera stack — tile them.
    def _stack(p):
        if fast.num_cameras == 1:
            return p
        return jnp.concatenate([p] * fast.num_cameras, axis=0)

    pos0 = [_stack(p) for p in fast._pos0]
    dir0 = [_stack(p) for p in fast._dir0]

    def channels(params, orientation, translation):
        return sharded(
            params, orientation, translation, *pos0, *dir0, fast._valid,
        )

    return channels


def fast_shard_render(fast, mesh: Mesh, *, mode: int = 0, degree: int = 1,
                      marching_steps: Optional[int] = None):
    """A jitted sharded render step on the fused-kernel path:
    ``(params, orientation, translation) -> (1, H, W, 3)``."""
    chan_fn = make_channel_fn(
        fast, mesh, mode=mode, degree=degree, marching_steps=marching_steps
    )
    rep = NamedSharding(mesh, P())

    def render(params, orientation, translation):
        ch = chan_fn(params, orientation, translation)
        return fast._assemble([ch[0], ch[1], ch[2]])

    return jax.jit(render, in_shardings=(rep, rep, rep))


def fast_shard_render_with_alpha(fast, mesh: Mesh, *, mode: int = 0,
                                 degree: int = 1,
                                 marching_steps: Optional[int] = None,
                                 beta: Optional[float] = None):
    """A jitted sharded render-with-coverage step on the fused-kernel path:
    ``(params, orientation, translation) -> (image (1, H, W, 3),
    alpha (1, H, W, 1))``."""
    chan_fn = make_channel_fn(
        fast, mesh, mode=mode, degree=degree, marching_steps=marching_steps,
        with_alpha=True, beta=beta,
    )
    rep = NamedSharding(mesh, P())

    def render(params, orientation, translation):
        ch = chan_fn(params, orientation, translation)
        return (
            fast._assemble([ch[0], ch[1], ch[2]]),
            fast._assemble([ch[3]]),
        )

    return jax.jit(render, in_shardings=(rep, rep, rep))


def target_planes(fast, mesh: Mesh, target):
    """Lay a (1, H, W, 3) target image out as (3, rows, 128) channel planes
    sharded like the render output."""
    _, _, chan_spec = _plane_specs(mesh)
    planes = fast.image_to_planes(jnp.asarray(target, fast.dtype))
    return jax.device_put(planes, NamedSharding(mesh, chan_spec))


def fast_train_step(fast, mesh: Mesh, optimizer, *, mode: int = 0,
                    degree: int = 1, marching_steps: Optional[int] = None):
    """A jitted sharded inverse-rendering train step on the fused-kernel
    path: ``(params, opt_state, target_planes, orientation, translation) ->
    (params, opt_state, loss)``.

    The pixel loss is computed in plane space (masked MSE over valid slots,
    scaled to the image element count, so it equals the image-space MSE);
    scene-parameter cotangents from every shard are psum-reduced by
    shard_map's transpose, and the optimizer update runs replicated.
    """
    import optax

    chan_fn = make_channel_fn(
        fast, mesh, mode=mode, degree=degree, marching_steps=marching_steps
    )
    _, _, chan_spec = _plane_specs(mesh)
    rep = NamedSharding(mesh, P())
    plane_sh = NamedSharding(mesh, chan_spec)
    n_elems = fast.num_cameras * fast.total * 3
    valid = fast._valid

    def loss_fn(params, orientation, translation, target):
        ch = chan_fn(params, orientation, translation)
        err = (ch - target) * valid[None]
        return jnp.sum(err * err) / n_elems

    def step(params, opt_state, target, orientation, translation):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, orientation, translation, target
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(rep, rep, plane_sh, rep, rep),
        out_shardings=(rep, rep, rep),
    )


def fast_train_step_silhouette(fast, mesh: Mesh, optimizer, *, mode: int = 0,
                               degree: int = 1,
                               marching_steps: Optional[int] = None,
                               beta: Optional[float] = None,
                               silhouette_weight: float = 1.0,
                               background: float = 0.0):
    """Silhouette-aware sharded train step on the fused-kernel path:
    ``(params, opt_state, target_planes, target_alpha_planes, orientation,
    translation) -> (params, opt_state, loss)``.

    Same objective as :func:`ray_marching_tpu.optim.inverse.optimize` with
    ``silhouette_beta`` set: MSE of the α-composited image against a
    composited target plus ``silhouette_weight``·MSE of the coverage mask
    (both image-space means, computed in plane space over valid slots).
    Coverage is per-ray, so sharding adds no collectives beyond the psum'd
    parameter cotangents."""
    import optax

    chan_fn = make_channel_fn(
        fast, mesh, mode=mode, degree=degree, marching_steps=marching_steps,
        with_alpha=True, beta=beta,
    )
    _, _, chan_spec = _plane_specs(mesh)
    rep = NamedSharding(mesh, P())
    plane_sh = NamedSharding(mesh, chan_spec)
    n_px = fast.num_cameras * fast.total
    valid = fast._valid

    def loss_fn(params, orientation, translation, target, target_alpha):
        ch = chan_fn(params, orientation, translation)
        rgb, alpha = ch[:3], ch[3]
        comp = alpha[None] * rgb + (1.0 - alpha)[None] * background
        err = (comp - target) * valid[None]
        aerr = (alpha - target_alpha[0]) * valid
        return (
            jnp.sum(err * err) / (n_px * 3)
            + silhouette_weight * jnp.sum(aerr * aerr) / n_px
        )

    def step(params, opt_state, target, target_alpha, orientation,
             translation):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, orientation, translation, target, target_alpha
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(rep, rep, plane_sh, plane_sh, rep, rep),
        out_shardings=(rep, rep, rep),
    )
