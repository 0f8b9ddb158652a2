"""Fused Pallas (Mosaic) sphere-tracing kernel.

The reference's hot loop is 32+ sequential full-scene SDF evaluations over
millions of rays (reference: rendering/ray_marching.py:78-84; SURVEY.md §3.2
"the kernel to fuse"). This kernel keeps a tile of rays resident in VMEM
across *all* marching steps — one HBM round-trip total instead of one per
step — and adds per-tile early exit: the scene SDF is inlined (traced) into
the kernel body, every op an elementwise VPU op on (TILE, 128) coordinate
planes.

Layout: rays are flattened and laid out as six structure-of-array planes
(px, py, pz, dx, dy, dz) of shape (rows, 128) — no last-dim-3 arrays reach
the TPU, so there are no gathers or awkward (…, 3) tilings. Scene parameters
(O(10²) scalars) ride along as one ravelled vector, unravelled back into the
params pytree inside the kernel.

Differentiation: a ``jax.custom_vjp`` pairs the fused forward with the
checkpointed ``lax.scan`` marcher's backward (recomputed from the saved
inputs) — the fixed-point recompute costs one extra forward but keeps
backward memory at the scan's O(steps) residuals of the *recomputation*,
not the kernel's.

Early exit (``tau > 0``): rays within ``tau`` of the surface freeze
(``d ← 0``), and a whole tile stops marching once every ray in it is
frozen (``lax.while_loop`` on the tile's live count). ``tau = 0``
reproduces the reference's unconditional update exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.flatten_util import ravel_pytree

from ray_marching_tpu.render import march as march_mod

LANES = 128
DEFAULT_ROWS_PER_TILE = 256


def ravel_params_padded(params, dtype):
    """ravel_pytree that tolerates parameterless scenes: Mosaic block specs
    need width >= 1, so an empty vector is padded to one dummy zero and the
    unravel ignores the padding."""
    flat, unravel = ravel_pytree(params)
    if flat.size == 0:
        return jnp.zeros((1,), dtype), lambda v: unravel(v[:0])
    return flat, unravel


def _pad_rows(flat: jnp.ndarray, rows: int, *, edge: bool = False
              ) -> jnp.ndarray:
    """(R,) -> (rows, 128). ``edge=True`` repeats the last real value into
    the pad slots — ray planes MUST pad this way: zero-filled pads sit at
    the world origin, a gradient singularity for many scenes, and the
    where-mask only zeroes the pad COTANGENT, which cannot stop the
    0·inf = NaN inside the SDF's sqrt VJP from poisoning the (shared)
    parameter cotangent (CLAUDE.md pad-slot invariant; same fix as the
    mega-kernel's edge-replicated padding). The validity plane keeps zero
    fill."""
    total = flat.shape[0]
    padded_len = rows * LANES
    if padded_len != total:
        pad = (
            jnp.broadcast_to(flat[-1], (padded_len - total,))
            if edge
            else jnp.zeros((padded_len - total,), flat.dtype)
        )
        flat = jnp.concatenate([flat, pad])
    return flat.reshape(rows, LANES)


def _march_kernel(sdf_c, unravel, steps, tau,
                  params_ref, px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref,
                  valid_ref, ox_ref, oy_ref, oz_ref, od_ref):
    params = unravel(params_ref[0, :])
    x, y, z = px_ref[:], py_ref[:], pz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    valid = valid_ref[:] > 0.5

    # Padding slots never move (where-select, so their SDF eval — which may
    # sit on a gradient singularity like the origin — contributes neither
    # value nor cotangent).
    if tau == 0.0:

        def body(_, carry):
            x, y, z = carry
            d = sdf_c(params, x, y, z)
            return (
                jnp.where(valid, x + d * dx, x),
                jnp.where(valid, y + d * dy, y),
                jnp.where(valid, z + d * dz, z),
            )

        if steps <= 64:
            for _ in range(steps):  # static unroll: Mosaic pipelines steps
                x, y, z = body(None, (x, y, z))
        else:
            x, y, z = lax.fori_loop(0, steps, body, (x, y, z))
    else:

        def cond(carry):
            i, _, _, _, any_live = carry
            return jnp.logical_and(i < steps, any_live)

        def body(carry):
            i, x, y, z, _ = carry
            d = sdf_c(params, x, y, z)
            live = jnp.logical_and(jnp.abs(d) >= tau, valid)
            return (
                i + 1,
                jnp.where(live, x + d * dx, x),
                jnp.where(live, y + d * dy, y),
                jnp.where(live, z + d * dz, z),
                jnp.any(live),
            )

        _, x, y, z, _ = lax.while_loop(
            cond, body, (jnp.int32(0), x, y, z, jnp.bool_(True))
        )

    ox_ref[:] = x
    oy_ref[:] = y
    oz_ref[:] = z
    od_ref[:] = jnp.where(valid, sdf_c(params, x, y, z), jnp.zeros((), x.dtype))


def _pallas_march_flat(sdf_c, unravel, steps, tau, rows_per_tile, interpret,
                       flat_params, planes):
    """planes: 6 arrays (rows, 128) -> (marched x, y, z, terminal distance)."""
    rows = planes[0].shape[0]
    dtype = planes[0].dtype
    if rows % rows_per_tile:
        # Floor division below would silently drop the trailing rows.
        raise ValueError(f"rows={rows} not a multiple of tile={rows_per_tile}")
    num_tiles = rows // rows_per_tile
    kernel = functools.partial(_march_kernel, sdf_c, unravel, steps, tau)
    plane_spec = pl.BlockSpec(
        (rows_per_tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    params_spec = pl.BlockSpec(
        (1, flat_params.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, LANES), dtype)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[params_spec] + [plane_spec] * 7,
        out_specs=[plane_spec] * 4,
        out_shape=[out_shape] * 4,
        interpret=interpret,
    )(flat_params, *planes)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 4, 5, 6)
)
def _pallas_march_core(sdf_c, unravel, flat_params, rays7, steps, tau,
                       interpret):
    """rays7: stacked (7, rows, 128) planes (px py pz dx dy dz valid).
    Returns (4, rows, 128): marched x, y, z + terminal distance."""
    planes = [rays7[i] for i in range(7)]
    outs = _pallas_march_flat(
        sdf_c, unravel, steps, tau, _tile_rows(rays7.shape[1]), interpret,
        flat_params[None, :], planes,
    )
    return jnp.stack(outs, axis=0)


def _tile_rows(rows: int) -> int:
    return min(DEFAULT_ROWS_PER_TILE, rows)


def _core_fwd(sdf_c, unravel, flat_params, rays7, steps, tau, interpret):
    out = _pallas_march_core(sdf_c, unravel, flat_params, rays7, steps, tau,
                             interpret)
    return out, (flat_params, rays7)


def _core_bwd(sdf_c, unravel, steps, tau, interpret, residuals, g):
    """Backward: differentiate the (rematerialized) scan marcher instead of
    the kernel — mathematically the same function."""
    flat_params, rays7 = residuals

    def reference_fn(flat_params, rays7):
        params = unravel(flat_params)
        px, py, pz, dx, dy, dz = (rays7[i] for i in range(6))
        valid = rays7[6] > 0.5

        def step(carry, _):
            x, y, z = carry
            d = sdf_c(params, x, y, z)
            if tau != 0.0:
                live = jnp.logical_and(jnp.abs(d) >= tau, valid)
            else:
                live = valid
            return (
                jnp.where(live, x + d * dx, x),
                jnp.where(live, y + d * dy, y),
                jnp.where(live, z + d * dz, z),
            ), None

        (x, y, z), _ = lax.scan(
            jax.checkpoint(step), (px, py, pz), None, length=steps
        )
        dist = jnp.where(valid, sdf_c(params, x, y, z), jnp.zeros((), x.dtype))
        return jnp.stack([x, y, z, dist], axis=0)

    _, vjp = jax.vjp(reference_fn, flat_params, rays7)
    return vjp(g)


_pallas_march_core.defvjp(_core_fwd, _core_bwd)


def pallas_march(sdf_c, params, ray_positions, ray_directions, steps: int,
                 *, tau: float = 0.0, interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused sphere-tracing over arbitrary-shaped ray bundles.

    Args:
        sdf_c: componentwise scene SDF ``f(params, x, y, z) -> d``.
        params: scene parameter pytree (differentiable).
        ray_positions / ray_directions: (..., 3) arrays.
        steps: static marching step count.
        tau: early-exit threshold (0 = exact reference parity).
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
        marched positions (..., 3). (The fused terminal distance is exposed
        via :func:`pallas_march_with_distance`.)
    """
    pos, _ = pallas_march_with_distance(
        sdf_c, params, ray_positions, ray_directions, steps, tau=tau,
        interpret=interpret,
    )
    return pos


def pallas_march_with_distance(sdf_c, params, ray_positions, ray_directions,
                               steps: int, *, tau: float = 0.0,
                               interpret: bool = False):
    """Like :func:`pallas_march` but also returns the terminal SDF values
    (..., 1) computed inside the kernel (saves one full scene eval)."""
    shape = ray_positions.shape[:-1]
    total = 1
    for s in shape:
        total *= s
    rows_per_tile = DEFAULT_ROWS_PER_TILE if total >= DEFAULT_ROWS_PER_TILE * LANES else 8
    rows = -(-total // (LANES * rows_per_tile)) * rows_per_tile

    flat_params, unravel = ravel_params_padded(params, ray_positions.dtype)

    def plane(a, idx):
        return _pad_rows(a[..., idx].reshape(-1), rows, edge=True)

    dtype = ray_positions.dtype
    valid = _pad_rows(jnp.ones((total,), dtype), rows)
    rays7 = jnp.stack(
        [plane(ray_positions, 0), plane(ray_positions, 1), plane(ray_positions, 2),
         plane(ray_directions, 0), plane(ray_directions, 1), plane(ray_directions, 2),
         valid],
        axis=0,
    )
    out = _pallas_march_core(sdf_c, unravel, flat_params, rays7, steps, tau,
                             interpret)
    x, y, z, d = (out[i].reshape(-1)[:total] for i in range(4))
    pos = jnp.stack([x, y, z], axis=-1).reshape(shape + (3,))
    dist = d.reshape(shape + (1,))
    return pos, dist
