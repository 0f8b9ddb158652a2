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

from ray_marching_tpu.render import march as march_mod

LANES = 128
# Round-4 sweep (1080p, 32 steps, use_pallas modular path, v5e): 64-row
# tiles 2.50 ms, 128 → 2.61, 256 → 3.10 — same winner as the mega-kernel
# (ops/pallas_render).
DEFAULT_ROWS_PER_TILE = 64


class _ParamSplit:
    """The rebuild closure of :func:`split_params_padded` (callable with
    the old ``rebuild(flat, mats) -> params`` contract), plus the pieces
    the backward kernels need to handle small-leaf cotangents WITHOUT a
    1-D concatenate (Mosaic rejects every 1-D concat whose result crosses
    a 128-lane tile, aligned or not — probed on v5e): ``split_small`` /
    ``assemble`` let the kernels differentiate w.r.t. the small-leaf
    TUPLE and store each leaf's cotangent into its own (row-aligned)
    lanes of the output block."""

    def __init__(self, treedef, is_mat, specs):
        self.treedef = treedef
        self.is_mat = is_mat
        #: tuple of (flat_offset, size, shape) per small leaf; offsets are
        #: 128-lane aligned so every leaf starts a fresh output row.
        self.specs = specs

    def split_small(self, v):
        return tuple(
            v[off:off + size].reshape(shape) for off, size, shape in self.specs
        )

    def assemble(self, small, mats):
        import jax

        out, im, isml = [], iter(mats), iter(small)
        for m in self.is_mat:
            out.append(next(im) if m else next(isml))
        return jax.tree_util.tree_unflatten(self.treedef, out)

    def __call__(self, v, mats):
        return self.assemble(self.split_small(v), mats)


def split_params_padded(params, dtype):
    """Partition a params pytree for kernel entry: matrix leaves ride as
    native 2-D+ VMEM inputs, everything else through one flat lane vector
    with each leaf in its own 128-lane-aligned segment.

    Mosaic cannot rebuild a matrix from a flat row — every reshape
    ``(1, n) → (a, b)`` with b ≠ 128k, every sublane concat of
    non-128-lane pieces, and 1-D→2-D casts in general hit
    "unsupported shape cast" / "offset mismatch" (probed exhaustively on
    v5e). Passing ndim≥2 leaves as their own kernel inputs gives them a
    native VMEM layout — which the MXU matmuls of
    :func:`scene.neural.neural_sdf_matmul` want anyway. The 128-lane
    alignment of the small-leaf segments keeps every leaf on whole output
    rows for the backward kernels' per-leaf cotangent stores.

    Returns:
        (flat, mats, rebuild): ``flat`` is the 1-D aligned-segment layout
        of the scalar/vector leaves (length >= 1); ``mats`` is a tuple of
        the ndim >= 2 leaves (cast to ``dtype``, pytree order);
        ``rebuild(flat_1d, mats) -> params`` (a :class:`_ParamSplit`)
        reassembles the pytree and is pure jnp (valid inside kernels,
        under jit, and under jax.vjp).
    """
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    is_mat = [jnp.ndim(leaf) >= 2 for leaf in leaves]
    mats = tuple(
        jnp.asarray(leaf, dtype) for leaf, m in zip(leaves, is_mat) if m
    )
    small = [leaf for leaf, m in zip(leaves, is_mat) if not m]
    specs = []
    segs = []
    off = 0
    for leaf in small:
        a = jnp.asarray(leaf, dtype).reshape(-1)
        size = a.shape[0]
        seg = max(1, -(-size // LANES)) * LANES
        specs.append((off, size, jnp.shape(leaf)))
        segs.append(jnp.pad(a, (0, seg - size)))
        off += seg
    flat = (
        jnp.concatenate(segs) if segs else jnp.zeros((LANES,), dtype)
    )
    return flat, mats, _ParamSplit(treedef, is_mat, tuple(specs))


def mat_in_specs(mats):
    """Whole-array VMEM BlockSpecs for matrix kernel inputs (same block at
    every grid step)."""
    return [
        pl.BlockSpec(m.shape, _zero_index_map(jnp.ndim(m)),
                     memory_space=pltpu.VMEM)
        for m in mats
    ]


def _zero_index_map(ndim):
    return lambda i: (0,) * ndim


def matmul_width(mats) -> int:
    """Largest matrix dimension among the kernel's matrix inputs — sizes
    the per-tile VMEM the MLP hidden blocks need (rows_per_tile and the
    scoped-VMEM budget scale off this)."""
    return max((max(m.shape) for m in mats), default=0)


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


def _march_kernel(sdf_c, rebuild, steps, tau, n_mats,
                  params_ref, *refs):
    mat_refs, refs = refs[:n_mats], refs[n_mats:]
    (px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, valid_ref,
     ox_ref, oy_ref, oz_ref, od_ref) = refs
    params = rebuild(params_ref[0, :], tuple(r[:] for r in mat_refs))
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


def _pallas_march_flat(sdf_c, rebuild, steps, tau, rows_per_tile, interpret,
                       flat_params, mats, planes):
    """planes: 6 arrays (rows, 128) -> (marched x, y, z, terminal distance)."""
    rows = planes[0].shape[0]
    dtype = planes[0].dtype
    if rows % rows_per_tile:
        # Floor division below would silently drop the trailing rows.
        raise ValueError(f"rows={rows} not a multiple of tile={rows_per_tile}")
    num_tiles = rows // rows_per_tile
    kernel = functools.partial(
        _march_kernel, sdf_c, rebuild, steps, tau, len(mats)
    )
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
        in_specs=[params_spec] + mat_in_specs(mats) + [plane_spec] * 7,
        out_specs=[plane_spec] * 4,
        out_shape=[out_shape] * 4,
        interpret=interpret,
        compiler_params=neural_compiler_params(
            mats, interpret, flat_len=flat_params.shape[1]
        ),
    )(flat_params, *mats, *planes)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7)
)
def _pallas_march_core(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                       interpret):
    """rays7: stacked (7, rows, 128) planes (px py pz dx dy dz valid).
    Returns (4, rows, 128): marched x, y, z + terminal distance."""
    planes = [rays7[i] for i in range(7)]
    outs = _pallas_march_flat(
        sdf_c, rebuild, steps, tau,
        _tile_rows(rays7.shape[1], matmul_width(mats),
                   segs=flat_params.shape[0] // LANES), interpret,
        flat_params[None, :], mats, planes,
    )
    return jnp.stack(outs, axis=0)


# Scoped-VMEM budget for kernels whose scenes carry matrix leaves (neural
# SDFs): the MXU hidden blocks are (width, tile·128) VMEM temporaries —
# 4 MB each at width 64/tile 128 — and the Mosaic default 16 MiB OOMs
# (measured: 19.25M at width 64). v5e has 128 MiB physical VMEM.
NEURAL_VMEM_LIMIT_BYTES = 100 * 2**20
# Above this width the ray tile halves so the hidden blocks stay ~8 MB.
NEURAL_TILE_WIDTH_CAP = 128


#: WIDE analytic scenes (many union leaves) scale the kernels' live plane
#: set with leaf count: each leaf's transformed-coordinate planes and the
#: vmin chain stay resident per tile. Measured on v5e (round 5,
#: tools/scene_width_sweep.py): 32 leaves (96 lane-segments) fit the
#: 16 MiB default scoped-VMEM budget; 64 leaves (192 segments) need
#: 25.09 MiB at tile 64 ("Ran out of memory in memory space vmem ...
#: scoped"). The budget grows ~256 KiB per 128-lane param segment, capped
#: below physical VMEM; very wide scenes additionally shrink the ray tile.
WIDE_VMEM_PER_SEG = 256 * 1024
WIDE_VMEM_CAP = 100 * 2**20
WIDE_SEGS_TILE32 = 256
WIDE_SEGS_TILE16 = 512


def wide_vmem_bytes(flat_len: int) -> int:
    """Scoped-VMEM need estimate for a scene with ``flat_len`` packed
    param lanes (0 = within the 16 MiB default)."""
    segs = flat_len // LANES
    want = segs * WIDE_VMEM_PER_SEG
    return min(WIDE_VMEM_CAP, want) if want > 16 * 2**20 else 0


def _tile_rows(rows: int, width: int = 0, default: int | None = None,
               segs: int = 0) -> int:
    """Ray-tile row count for a kernel call. ``default`` is the caller's
    analytic-scene tile (each kernel has its own measured winner — see
    the sweep notes on pallas_render.DEFAULT_ROWS_PER_TILE and this
    module's DEFAULT_ROWS_PER_TILE, both currently 64; a round-3 refactor
    silently switched the mega-kernel to the marcher's then-256 default,
    costing 10% forward AND breaking the history handoff's row-padding
    match at 1080p — the 238-vs-250 Mrays/s regression)."""
    import os

    tile = min(DEFAULT_ROWS_PER_TILE if default is None else default, rows)
    if width > NEURAL_TILE_WIDTH_CAP:
        tile = min(tile, 64)
    if segs > WIDE_SEGS_TILE16:
        tile = min(tile, 16)
    elif segs > WIDE_SEGS_TILE32:
        tile = min(tile, 32)
    env = os.environ.get("RM_TPU_NEURAL_TILE")
    if env and width:
        tile = min(int(env), rows)
    return tile


def neural_compiler_params(mats, interpret, base_bytes=None, flat_len=0):
    """CompilerParams for kernels needing a raised scoped-VMEM budget:
    matrix-leaf (neural) scenes, wide analytic scenes (``flat_len``
    packed param lanes — see wide_vmem_bytes), or a caller's own
    ``base_bytes`` (e.g. the history-logging forward); the max wins."""
    if interpret:
        return None
    want = NEURAL_VMEM_LIMIT_BYTES if mats else None
    if base_bytes is not None:
        want = max(want or 0, base_bytes)
    wide = wide_vmem_bytes(flat_len)
    if wide:
        want = max(want or 0, wide)
    if not want:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=want)


def _core_fwd(sdf_c, rebuild, flat_params, mats, rays7, steps, tau, interpret):
    out = _pallas_march_core(sdf_c, rebuild, flat_params, mats, rays7, steps,
                             tau, interpret)
    return out, (flat_params, mats, rays7)


def _core_bwd(sdf_c, rebuild, steps, tau, interpret, residuals, g):
    """Backward: differentiate the (rematerialized) scan marcher instead of
    the kernel — mathematically the same function."""
    flat_params, mats, rays7 = residuals

    def reference_fn(flat_params, mats, rays7):
        params = rebuild(flat_params, mats)
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

    _, vjp = jax.vjp(reference_fn, flat_params, mats, rays7)
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

    flat_params, mats, rebuild = split_params_padded(
        params, ray_positions.dtype
    )

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
    out = _pallas_march_core(sdf_c, rebuild, flat_params, mats, rays7, steps,
                             tau, interpret)
    x, y, z, d = (out[i].reshape(-1)[:total] for i in range(4))
    pos = jnp.stack([x, y, z], axis=-1).reshape(shape + (3,))
    dist = d.reshape(shape + (1,))
    return pos, dist
