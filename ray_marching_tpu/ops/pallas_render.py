"""Fused march + normals + Laplacian Pallas kernel ("mega-kernel").

One kernel call performs, per VMEM-resident ray tile, everything between
ray generation and shading (compare the modular path's separate XLA ops:
march scan → terminal eval → 4-offset normals eval + centre eval,
reference rendering/ray_marching.py:67-125):

  1. the full sphere-tracing loop (``steps`` fused SDF evaluations);
  2. the terminal signed distance (= the Laplacian centre eval, reused);
  3. four tetrahedral offset evaluations → normals via the precomputed
     3×3 inverse → L2 normalization;
  4. the Laplacian ``(f(p) − mean(f(p + εvᵢ)))·6/ε²``.

The scene SDF, the offsets, and the inverse matrix are all baked into the
kernel at trace time; rays never leave VMEM between the march and the
normal estimation. Used by the plane-native fast renderer
(:mod:`ray_marching_tpu.render.fast`).

Differentiation: custom VJP via a jnp plane-native recompute (checkpointed
scan march + the same normals formulas), like
:mod:`ray_marching_tpu.ops.pallas_march`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_marching_tpu.render.normals import make_offsets

LANES = 128
# Tuned on TPU v5e. Round-4 sweep at 1080p (3 interleaved repeats each):
# forward tau=0 — 64-row 2.09-2.15 ms ≈ 32-row 2.15 < 128-row 2.22 <
# 192-row 2.45 < 256-row 2.46; tau=1e-3 forward — 64-row 2.29 best
# (32-row 2.64: segment-exit selectivity loses, matching the round-2
# note); 4K forward — 64-row 8.37 best (128-row 8.82). 64 wins or ties
# every forward workload.
DEFAULT_ROWS_PER_TILE = 64
MAX_UNROLL_STEPS = 64
# Early-exit (tau > 0) convergence-check cadence: steps per while_loop
# segment. See _march_tile.
EXIT_SEG = 8


def _normals_block(sdf_c, params, x, y, z, d_centre, offsets, inverse, eps):
    """Componentwise tetrahedral normals + Laplacian at (x, y, z) planes.

    ``offsets`` (4, 3) and ``inverse`` (3, 3) are python/numpy constants;
    the 4 offset evaluations unroll at trace time.
    """
    f = [
        sdf_c(params, x + offsets[i, 0], y + offsets[i, 1], z + offsets[i, 2])
        for i in range(4)
    ]
    d1, d2, d3 = f[1] - f[0], f[2] - f[0], f[3] - f[0]
    nx = inverse[0, 0] * d1 + inverse[0, 1] * d2 + inverse[0, 2] * d3
    ny = inverse[1, 0] * d1 + inverse[1, 1] * d2 + inverse[1, 2] * d3
    nz = inverse[2, 0] * d1 + inverse[2, 1] * d2 + inverse[2, 2] * d3
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    mean4 = (f[0] + f[1] + f[2] + f[3]) * 0.25
    lap = (d_centre - mean4) * (6.0 / eps**2)
    return nx / norm, ny / norm, nz / norm, lap


def _march_tile(sdf_c, params, steps, tau, valid, x, y, z, dx, dy, dz,
                track_min=False, hist_ref=None, track_argpos=False):
    """The in-kernel sphere-trace loop over one VMEM tile.

    With ``track_min`` also returns the along-ray closest approach
    ``min_i f(p_i)`` (same semantics as
    :func:`ray_marching_tpu.render.march.march_with_closest`: the min spans
    the ``steps`` pre-step evaluations, not the terminal one).

    With ``hist_ref`` (a (steps+1, 3, tile, 128) output ref) every pre-step
    position plus the terminal position is logged — the fused backward
    kernel then skips its in-kernel forward recompute and reads this
    history instead (bitwise-identical trajectories, the same elementwise
    op sequence either way). For tau > 0 (``track_min`` excluded) the
    early-exit march logs at dynamic step indices up to its exit step and
    additionally returns that step count, so the backward knows how much
    of the fixed-shape history is live.

    track_min at tau == 0 also tracks the FIRST step attaining the min
    (strict-inequality updates, the fused backward's tie convention) and
    returns it as a fifth int32 plane, so the backward's min_f cotangent
    routing can run straight off the handed-over history. ``track_argpos``
    additionally tracks the POSITION at that step (the argmin-frozen IFT
    coverage backward needs it; see fused_march_normals_cov_ift)."""
    minf = jnp.full_like(x, jnp.finfo(x.dtype).max)
    argpos = (x, y, z) if (track_min and track_argpos) else None

    if tau == 0.0:
        amin = jnp.full(x.shape, -1, jnp.int32) if track_min else None

        def body(i, carry):
            x, y, z, minf, amin, argpos = carry
            if hist_ref is not None:
                hist_ref[i, 0] = x
                hist_ref[i, 1] = y
                hist_ref[i, 2] = z
            d = sdf_c(params, x, y, z)
            if track_min:
                take = d < minf
                if argpos is not None:
                    argpos = tuple(
                        jnp.where(take, c, a) for c, a in zip((x, y, z), argpos)
                    )
                amin = jnp.where(take, jnp.asarray(i, jnp.int32), amin)
                minf = jnp.where(take, d, minf)
            return (
                jnp.where(valid, x + d * dx, x),
                jnp.where(valid, y + d * dy, y),
                jnp.where(valid, z + d * dz, z),
                minf,
                amin,
                argpos,
            )

        carry = (x, y, z, minf, amin, argpos)
        if steps <= MAX_UNROLL_STEPS:
            # Static unroll lets Mosaic software-pipeline across steps.
            for i in range(steps):
                carry = body(i, carry)
        else:
            carry = lax.fori_loop(0, steps, body, carry)
        x, y, z, minf, amin, argpos = carry
        if hist_ref is not None:
            hist_ref[steps, 0] = x
            hist_ref[steps, 1] = y
            hist_ref[steps, 2] = z
        if track_min:
            return x, y, z, minf, amin, argpos
    else:
        # Early-exit march with a SEGMENT-granularity check: each
        # while_loop iteration runs EXIT_SEG statically-unrolled masked
        # steps, then the whole tile exits once every ray is within tau.
        # The round-1 per-step while_loop exit lost more to loop overhead
        # and lost unrolling than the skipped evaluations saved; the
        # segment cadence keeps the unrolled-step pipelining and pays the
        # loop check 1/EXIT_SEG as often. Frozen rays re-evaluate an
        # unchanged position, so neither the per-step mask, the early
        # exit, nor the always-run masked tail changes any result.
        assert not (track_min and hist_ref is not None), (
            "tau > 0 history handoff excludes the coverage plane"
        )

        def masked_step(x, y, z, minf, argpos):
            d = sdf_c(params, x, y, z)
            if track_min:
                if argpos is not None:
                    take = d < minf
                    argpos = tuple(
                        jnp.where(take, c, a) for c, a in zip((x, y, z), argpos)
                    )
                    minf = jnp.where(take, d, minf)
                else:
                    minf = jnp.minimum(minf, d)
            live = jnp.logical_and(jnp.abs(d) >= tau, valid)
            return (
                jnp.where(live, x + d * dx, x),
                jnp.where(live, y + d * dy, y),
                jnp.where(live, z + d * dz, z),
                minf,
                argpos,
                live,
            )

        n_seg, tail = divmod(steps, EXIT_SEG)

        def cond(carry):
            s, _, _, _, _, _, any_live = carry
            return jnp.logical_and(s < n_seg, any_live)

        def body(carry):
            s, x, y, z, minf, argpos, _ = carry
            for k in range(EXIT_SEG):
                if hist_ref is not None:
                    hist_ref[s * EXIT_SEG + k, 0] = x
                    hist_ref[s * EXIT_SEG + k, 1] = y
                    hist_ref[s * EXIT_SEG + k, 2] = z
                x, y, z, minf, argpos, live = masked_step(x, y, z, minf, argpos)
            return (s + 1, x, y, z, minf, argpos, jnp.any(live))

        s_end, x, y, z, minf, argpos, _ = lax.while_loop(
            cond, body, (jnp.int32(0), x, y, z, minf, argpos, jnp.bool_(True))
        )
        for t in range(tail):
            if hist_ref is not None:
                hist_ref[s_end * EXIT_SEG + t, 0] = x
                hist_ref[s_end * EXIT_SEG + t, 1] = y
                hist_ref[s_end * EXIT_SEG + t, 2] = z
            x, y, z, minf, argpos, _ = masked_step(x, y, z, minf, argpos)
        if hist_ref is not None:
            # Terminal position at the static tail slot; planes between the
            # live count and `steps` stay unwritten (the backward never
            # reads past its handed-over step count).
            hist_ref[steps, 0] = x
            hist_ref[steps, 1] = y
            hist_ref[steps, 2] = z
            return x, y, z, s_end * EXIT_SEG + tail

    if track_min:  # tau > 0: no amin (dynamic-length march, no handoff)
        return x, y, z, minf, None, argpos
    return x, y, z


class _RowSliceHist:
    """View of the history ref restricted to a row band: forwards
    ``hist[i, c] = plane`` stores as ``ref[i, c, s0:s1] = plane`` so the
    dual-issue half-tiles (below) share one full-tile history buffer and
    the backward's handoff layout stays unchanged."""

    def __init__(self, ref, s0, s1):
        self._ref, self._s0, self._s1 = ref, s0, s1

    def __setitem__(self, idx, val):
        i, c = idx
        self._ref[i, c, self._s0:self._s1] = val


def _render_kernel(sdf_c, rebuild, steps, tau, offsets, inverse, eps,
                   track_min, log_hist, track_argpos, dual, n_mats,
                   params_ref, *refs):
    mat_refs, refs = refs[:n_mats], refs[n_mats:]
    (px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, valid_ref,
     ox_ref, oy_ref, oz_ref, od_ref,
     nx_ref, ny_ref, nz_ref, lap_ref, *extra_refs) = refs
    params = rebuild(params_ref[0, :], tuple(r[:] for r in mat_refs))
    x, y, z = px_ref[:], py_ref[:], pz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    valid = valid_ref[:] > 0.5
    extra = list(extra_refs)
    minf_ref = extra.pop(0) if track_min else None
    amin_ref = extra.pop(0) if (track_min and log_hist) else None
    argpos_refs = (
        [extra.pop(0) for _ in range(3)] if (track_min and track_argpos)
        else None
    )
    hist_ref = extra.pop(0) if log_hist else None
    # tau > 0: the per-tile exit step (how much of the history is live),
    # broadcast over an int32 plane — Mosaic has no per-grid-step SMEM
    # scalar outputs, and the plane is noise next to the history itself.
    nact_ref = extra.pop(0) if (log_hist and tau != 0.0) else None

    if dual:
        # RM_TPU_NEURAL_DUAL experiment: march the tile as two independent
        # half-tiles traced back to back. With steps <= MAX_UNROLL_STEPS
        # both marches are straight-line code in one block, giving the
        # Mosaic scheduler two dependency-free chains — the hypothesis was
        # that one half's VPU activation (sine) work could overlap the
        # other half's MXU dots, the residual headroom the round-5
        # roofline trace identified for wide-net forwards. MEASURED
        # NEUTRAL on v5e (512², 16 steps, sine_fast): w256 fwd 14.78 vs
        # 14.92 ms, w64 4.41 vs 4.23 — the scheduler does not exploit the
        # cross-chain independence (or already overlaps within one chain),
        # so the flag stays an off-by-default probe. Bitwise-identical per
        # row to the single-chain form: a dot's contraction order does not
        # depend on the batch (N) partition, so the handoff invariant and
        # all parity pins hold with the flag on or off
        # (tests/test_neural_matmul.py::test_dual_issue_bitwise).
        zero = jnp.zeros((), x.dtype)
        h = x.shape[0] // 2
        for s0, s1 in ((0, h), (h, x.shape[0])):
            hr = (
                _RowSliceHist(hist_ref, s0, s1)
                if hist_ref is not None else None
            )
            v = valid[s0:s1]
            xs, ys, zs = _march_tile(
                sdf_c, params, steps, 0.0, v, x[s0:s1], y[s0:s1], z[s0:s1],
                dx[s0:s1], dy[s0:s1], dz[s0:s1], hist_ref=hr,
            )
            d_c = jnp.where(v, sdf_c(params, xs, ys, zs), zero)
            nxs, nys, nzs, laps = _normals_block(
                sdf_c, params, xs, ys, zs, d_c, offsets, inverse, eps
            )
            ox_ref[s0:s1] = xs
            oy_ref[s0:s1] = ys
            oz_ref[s0:s1] = zs
            od_ref[s0:s1] = d_c
            nx_ref[s0:s1] = jnp.where(v, nxs, zero)
            ny_ref[s0:s1] = jnp.where(v, nys, zero)
            nz_ref[s0:s1] = jnp.where(v, nzs, zero)
            lap_ref[s0:s1] = jnp.where(v, laps, zero)
        return

    marched = _march_tile(
        sdf_c, params, steps, tau, valid, x, y, z, dx, dy, dz,
        track_min=track_min, hist_ref=hist_ref, track_argpos=track_argpos,
    )
    if nact_ref is not None:
        x, y, z, n_act = marched
        nact_ref[:] = jnp.full(
            nact_ref.shape, lax.convert_element_type(n_act, jnp.int32)
        )
        marched = (x, y, z)
    if track_min:
        x, y, z, minf, amin, argpos = marched
        # Invalid (pad) slots never march; park their min at +big so the
        # coverage sigmoid reads a clear miss.
        minf_ref[:] = jnp.where(
            valid, minf, jnp.full_like(minf, jnp.finfo(minf.dtype).max)
        )
        if amin_ref is not None:
            amin_ref[:] = amin
        if argpos_refs is not None:
            for ref, plane in zip(argpos_refs, argpos):
                ref[:] = plane
    else:
        x, y, z = marched

    zero = jnp.zeros((), x.dtype)
    d_centre = jnp.where(valid, sdf_c(params, x, y, z), zero)
    nx, ny, nz, lap = _normals_block(
        sdf_c, params, x, y, z, d_centre, offsets, inverse, eps
    )
    ox_ref[:] = x
    oy_ref[:] = y
    oz_ref[:] = z
    od_ref[:] = d_centre
    nx_ref[:] = jnp.where(valid, nx, zero)
    ny_ref[:] = jnp.where(valid, ny, zero)
    nz_ref[:] = jnp.where(valid, nz, zero)
    lap_ref[:] = jnp.where(valid, lap, zero)


def _call_render_kernel(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                        normals_eps, interpret, track_min, log_hist=False,
                        track_argpos=False):
    from ray_marching_tpu.ops.pallas_march import (
        _tile_rows,
        mat_in_specs,
        matmul_width,
        neural_compiler_params,
    )

    rows = rays7.shape[1]
    # default=DEFAULT_ROWS_PER_TILE (this module's measured winner — see
    # the sweep note on the constant) — NOT pallas_march's default: besides
    # any speed difference, a mismatched forward tile pads the history
    # buffer differently from the backward tile at most resolutions,
    # silently disabling the march-history handoff (fused_backward checks
    # hist.shape[2]).
    rows_per_tile = _tile_rows(rows, matmul_width(mats),
                               default=DEFAULT_ROWS_PER_TILE,
                               segs=flat_params.shape[0] // LANES)
    # Rows may not divide the tile (e.g. multi-camera stacks of 8-row-padded
    # blocks): pad by edge-replicating real rays (zero padding would park
    # the pad rays exactly at the world origin — a gradient singularity for
    # scenes with a primitive centred there) and slice the outputs back.
    # Pad rows march like their source rows; their outputs are discarded.
    pad = -rows % rows_per_tile
    if pad:
        rays7 = jnp.pad(rays7, ((0, 0), (0, pad), (0, 0)), mode="edge")
    num_tiles = (rows + pad) // rows_per_tile
    dtype = rays7.dtype
    # Constants must match the ray dtype (f64 numpy scalars would promote
    # f32 planes under x64 and break the kernel's typed ref stores).
    offsets, inverse = make_offsets(normals_eps, np_dtype=np.dtype(dtype))
    import os

    # Dual-issue half-tile experiment (see the block in _render_kernel):
    # matmul scenes only, exact-parity march shape (tau == 0, no coverage
    # plane), tiles big enough to split on the 8-row sublane grain.
    dual = (
        os.environ.get("RM_TPU_NEURAL_DUAL", "0") == "1"
        and bool(mats)
        and tau == 0.0
        and not track_min
        and rows_per_tile >= 16
        and rows_per_tile % 16 == 0
        and steps <= MAX_UNROLL_STEPS
    )
    kernel = functools.partial(
        _render_kernel, sdf_c, rebuild, steps, tau, offsets, inverse,
        normals_eps, track_min, log_hist, track_argpos, dual, len(mats),
    )
    plane_spec = pl.BlockSpec(
        (rows_per_tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    params_spec = pl.BlockSpec(
        (1, flat_params.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    n_out = 9 if track_min else 8
    out_shape = jax.ShapeDtypeStruct((rows + pad, LANES), dtype)
    out_specs = [plane_spec] * n_out
    out_shapes = [out_shape] * n_out
    if log_hist and track_min:
        # arg-min step plane (min_f cotangent routing in the backward).
        out_specs.append(plane_spec)
        out_shapes.append(
            jax.ShapeDtypeStruct((rows + pad, LANES), jnp.int32)
        )
    if track_argpos and track_min:
        # arg-min POSITION planes (argmin-frozen IFT coverage backward).
        out_specs += [plane_spec] * 3
        out_shapes += [out_shape] * 3
    if log_hist:
        # March history (pre-step positions + the terminal position) handed
        # to the fused backward so it can skip its forward recompute.
        out_specs.append(
            pl.BlockSpec(
                (steps + 1, 3, rows_per_tile, LANES),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((steps + 1, 3, rows + pad, LANES), dtype)
        )
        if tau != 0.0:
            if track_min:
                raise NotImplementedError(
                    "tau > 0 history handoff excludes the coverage plane"
                )
            # Per-tile exit step: how many history planes are live.
            out_specs.append(plane_spec)
            out_shapes.append(
                jax.ShapeDtypeStruct((rows + pad, LANES), jnp.int32)
            )
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[params_spec] + mat_in_specs(mats) + [plane_spec] * 7,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        # The double-buffered history block (2·(steps+1)·3 tile planes)
        # busts the 16 MiB default scoped-VMEM budget at 32 steps; matrix
        # (neural) scenes raise it further for the MXU hidden blocks.
        compiler_params=neural_compiler_params(
            mats, interpret, base_bytes=64 * 2**20 if log_hist else None,
            flat_len=flat_params.shape[0],
        ),
    )(flat_params[None, :], *mats, *[rays7[i] for i in range(7)])
    hist = amin = argpos = nact = None
    outs = list(outs)
    if log_hist and tau != 0.0:
        nact = outs.pop()
    if log_hist:
        hist = outs.pop()
    if track_argpos and track_min:
        planes = [outs.pop() for _ in range(3)][::-1]
        argpos = jnp.stack(planes, axis=0)
        argpos = argpos[:, :rows] if pad else argpos
    if log_hist and track_min:
        amin = outs.pop()
    out = jnp.stack(outs, axis=0)
    out = out[:, :rows] if pad else out
    if log_hist or track_argpos:
        return out, hist, amin, argpos, nact
    return out


def _split_sdf(sdf):
    """Normalize the sdf argument of the fused entry points to a
    ``(sdf_plain, sdf_fwd)`` pair.

    Callers may pass a single componentwise callable (used everywhere) or
    a 2-tuple: ``sdf_fwd`` — possibly the union-pruned FORWARD-ONLY
    compile (scene/graph.py compile_node(prune=True); contains 0/1-trip
    while-conditionals with no autodiff rule) — traces only into the
    non-differentiated forward kernels; ``sdf_plain`` is used wherever
    autodiff touches the SDF (the fused backward kernel, the IFT jnp
    math, recompute references)."""
    if isinstance(sdf, tuple):
        return sdf
    return sdf, sdf


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7, 8))
def fused_march_normals(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                        normals_eps, interpret):
    """rays7 (7, rows, 128) → (8, rows, 128): x y z d nx ny nz lap.

    ``sdf_c``: a componentwise SDF, or a ``(plain, forward-only)`` pair —
    see :func:`_split_sdf`. ``flat_params``/``mats``/``rebuild`` come from
    :func:`ops.pallas_march.split_params_padded` — matrix leaves (neural
    SDF weights) enter the kernel as native 2-D VMEM inputs so the MXU
    matmul evaluator can consume them (Mosaic cannot rebuild matrices from
    the flat lane vector)."""
    return _call_render_kernel(
        _split_sdf(sdf_c)[1], rebuild, flat_params, mats, rays7, steps,
        tau, normals_eps, interpret, False,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7, 8))
def fused_march_normals_cov(sdf_c, rebuild, flat_params, mats, rays7, steps,
                            tau, normals_eps, interpret):
    """Coverage variant: rays7 (7, rows, 128) → (9, rows, 128) — the 8
    planes of :func:`fused_march_normals` plus the along-ray closest
    approach ``min_f`` (plane 8, ``march.march_with_closest`` semantics).
    ``min_f`` is the silhouette-gradient carrier (render/silhouette.py);
    its backward routes the cotangent to the arg-min march step inside the
    fused backward kernel."""
    return _call_render_kernel(
        _split_sdf(sdf_c)[1], rebuild, flat_params, mats, rays7, steps,
        tau, normals_eps, interpret, True,
    )


def _reference_fn(sdf_c, rebuild, steps, tau, normals_eps, flat_params, mats,
                  rays7, track_min=False, track_argpos=False):
    """Plane-native jnp recompute of the kernel (for the backward pass).

    ``track_argpos`` (requires ``track_min``) additionally returns the
    (3, rows, 128) position of the along-ray minimum — the same
    strict-inequality first-min convention as ``_march_tile`` — so the
    XLA cov-IFT forward shares this step function instead of keeping a
    third copy of the march semantics. Returns ``(out, argpos)`` then."""
    assert track_min or not track_argpos
    params = rebuild(flat_params, mats)
    px, py, pz, dx, dy, dz = (rays7[i] for i in range(6))
    valid = rays7[6] > 0.5
    offsets, inverse = make_offsets(normals_eps, np_dtype=np.dtype(px.dtype))

    def step(carry, _):
        x, y, z = carry[:3]
        d = sdf_c(params, x, y, z)
        if tau != 0.0:
            live = jnp.logical_and(jnp.abs(d) >= tau, valid)
        else:
            live = valid
        out = (
            jnp.where(live, x + d * dx, x),
            jnp.where(live, y + d * dy, y),
            jnp.where(live, z + d * dz, z),
        )
        if track_argpos:
            minf, xm, ym, zm = carry[3:7]
            take = d < minf  # strict: first minimum wins (= _march_tile)
            out = out + (
                jnp.where(take, d, minf),
                jnp.where(take, x, xm),
                jnp.where(take, y, ym),
                jnp.where(take, z, zm),
            )
        elif track_min:
            out = out + (jnp.minimum(carry[3], d),)
        return out, None

    big = jnp.full_like(px, jnp.finfo(px.dtype).max)
    if track_argpos:
        init = (px, py, pz, big, px, py, pz)
    elif track_min:
        init = (px, py, pz, big)
    else:
        init = (px, py, pz)
    carry, _ = lax.scan(jax.checkpoint(step), init, None, length=steps)
    x, y, z = carry[:3]
    minf = carry[3] if track_min else big
    zero = jnp.zeros((), x.dtype)
    d_centre = jnp.where(valid, sdf_c(params, x, y, z), zero)
    nx, ny, nz, lap = _normals_block(
        sdf_c, params, x, y, z, d_centre, offsets, inverse, normals_eps
    )
    nx = jnp.where(valid, nx, zero)
    ny = jnp.where(valid, ny, zero)
    nz = jnp.where(valid, nz, zero)
    lap = jnp.where(valid, lap, zero)
    planes = [x, y, z, d_centre, nx, ny, nz, lap]
    if track_min:
        planes.append(jnp.where(valid, minf, big))
    out = jnp.stack(planes, axis=0)
    if track_argpos:
        return out, jnp.stack(carry[4:7], axis=0)
    return out


def _hist_enabled(rays7, steps, tau, track_min=False, mats=(),
                  flat_len=0):
    """Whether the differentiated forward should log its march history for
    the backward kernel (skips the backward's in-kernel forward recompute;
    bitwise-identical gradients). For tau > 0 the early-exit forward logs
    into the same fixed-shape buffer up to its per-tile exit step and hands
    that step count over as an SMEM scalar — except with a coverage plane
    (track_min), whose min-chain cotangent splitting needs every step. Off
    above a size cap (the history is (steps+1)·3 HBM planes — 796 MB at
    1080p/32 steps/f32)."""
    import os

    if os.environ.get("RM_TPU_BWD_HIST", "1") != "1":
        return False
    if tau != 0.0 and track_min:
        return False
    # The two-level-recompute backward ignores the handoff (it keeps
    # segment checkpoints instead); don't materialize a history it would
    # discard. Shared predicate — the two sites must agree.
    from ray_marching_tpu.ops.pallas_backward import two_level_engages

    if two_level_engages(steps, tau, track_min):
        return False
    # Default cap 4 GiB: admits 4K × 32 steps × f32 (3.3 GB — measured
    # 46.6 → 38.4 ms fwd+bwd, the handoff still wins with the history in
    # HBM) while keeping f64 / 64-step monsters on the recompute path.
    cap = int(os.environ.get("RM_TPU_BWD_HIST_MAX", str(2**32)))
    from ray_marching_tpu.ops.pallas_march import _tile_rows, matmul_width

    rows_per_tile = _tile_rows(rays7.shape[1], matmul_width(mats),
                               default=DEFAULT_ROWS_PER_TILE,
                               segs=flat_len // LANES)
    rows_padded = rays7.shape[1] + (-rays7.shape[1] % rows_per_tile)
    bytes_ = (steps + 1) * 3 * rows_padded * LANES * rays7.dtype.itemsize
    return bytes_ <= cap


def _fwd(sdf_c, rebuild, flat_params, mats, rays7, steps, tau, normals_eps,
         interpret):
    if _hist_enabled(rays7, steps, tau, mats=mats,
                     flat_len=flat_params.shape[0]):
        out, hist, _, _, nact = _call_render_kernel(
            _split_sdf(sdf_c)[1], rebuild, flat_params, mats, rays7, steps,
            tau, normals_eps, interpret, False, log_hist=True,
        )
    else:
        out, hist, nact = (
            fused_march_normals(
                sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                normals_eps, interpret,
            ),
            None,
            None,
        )
    return out, (flat_params, mats, rays7, hist, nact)


def _bwd(sdf_c, rebuild, steps, tau, normals_eps, interpret, residuals, g):
    flat_params, mats, rays7, hist, nact = residuals
    from ray_marching_tpu.ops.pallas_backward import fused_backward

    return fused_backward(
        sdf_c, rebuild, flat_params, mats, rays7, g, steps,
        normals_eps, interpret, tau=tau, hist=hist, nact=nact,
    )


fused_march_normals.defvjp(_fwd, _bwd)


def _fwd_cov(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
             normals_eps, interpret):
    if _hist_enabled(rays7, steps, tau, track_min=True, mats=mats,
                     flat_len=flat_params.shape[0]):
        out, hist, amin, _, _ = _call_render_kernel(
            _split_sdf(sdf_c)[1], rebuild, flat_params, mats, rays7, steps,
            tau, normals_eps, interpret, True, log_hist=True,
        )
    else:
        out, hist, amin = (
            fused_march_normals_cov(
                sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                normals_eps, interpret,
            ),
            None,
            None,
        )
    minf = out[8] if hist is not None else None
    return out, (flat_params, mats, rays7, hist, amin, minf)


def _bwd_cov(sdf_c, rebuild, steps, tau, normals_eps, interpret, residuals,
             g):
    flat_params, mats, rays7, hist, amin, minf = residuals
    from ray_marching_tpu.ops.pallas_backward import fused_backward

    return fused_backward(
        sdf_c, rebuild, flat_params, mats, rays7, g, steps,
        normals_eps, interpret, track_min=True, tau=tau, hist=hist,
        amin=amin, minf=minf,
    )


fused_march_normals_cov.defvjp(_fwd_cov, _bwd_cov)


# ---------------------------------------------------------------------------
# Implicit-function-theorem variant: same fused forward kernel, O(1) backward
# (no reverse sweep at all — see ray_marching_tpu.render.implicit for the
# math). Exact on converged rays; silhouette gradients differ from unrolled.
# ---------------------------------------------------------------------------


def _tail_planes(sdf_c, rebuild, normals_eps, valid, flat_params, mats,
                 x, y, z):
    params = rebuild(flat_params, mats)
    offsets, inverse = make_offsets(normals_eps, np_dtype=np.dtype(x.dtype))
    zero = jnp.zeros((), x.dtype)
    d_centre = jnp.where(valid, sdf_c(params, x, y, z), zero)
    nx, ny, nz, lap = _normals_block(
        sdf_c, params, x, y, z, d_centre, offsets, inverse, normals_eps
    )
    return (
        d_centre,
        jnp.where(valid, nx, zero),
        jnp.where(valid, ny, zero),
        jnp.where(valid, nz, zero),
        jnp.where(valid, lap, zero),
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7, 8, 9, 10)
)
def fused_march_normals_ift(sdf_c, rebuild, flat_params, mats, rays7, steps,
                            tau, normals_eps, interpret, hit_threshold=0.05,
                            denom_eps=1e-6):
    return fused_march_normals(
        sdf_c, rebuild, flat_params, mats, rays7, steps, tau, normals_eps,
        interpret
    )


def _ift_fwd(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
             normals_eps, interpret, hit_threshold, denom_eps):
    out = fused_march_normals(
        sdf_c, rebuild, flat_params, mats, rays7, steps, tau, normals_eps,
        interpret
    )
    return out, (flat_params, mats, rays7, out)


def _ift_bwd(sdf_c, rebuild, steps, tau, normals_eps, interpret,
             hit_threshold, denom_eps, residuals, g):
    sdf_c = _split_sdf(sdf_c)[0]  # jnp autodiff below: plain SDF only
    flat_params, mats, rays7, out = residuals
    x, y, z = out[0], out[1], out[2]
    d_star = out[3]
    px, py, pz, vx, vy, vz = (rays7[i] for i in range(6))
    valid = rays7[6] > 0.5

    # Tail (terminal distance + normals + laplacian) cotangents: one VJP.
    tail = functools.partial(_tail_planes, sdf_c, rebuild, normals_eps, valid)
    _, tail_vjp = jax.vjp(tail, flat_params, mats, x, y, z)
    gtheta, gmats, gx, gy, gz = tail_vjp((g[3], g[4], g[5], g[6], g[7]))
    gx, gy, gz = gx + g[0], gy + g[1], gz + g[2]

    # IFT at the fixed point: ∇f via one more VJP, then closed-form routing.
    def f_only(flat, mats, x, y, z):
        return sdf_c(rebuild(flat, mats), x, y, z)

    _, f_vjp = jax.vjp(f_only, flat_params, mats, x, y, z)
    ones = jnp.ones_like(d_star)
    _, _, nfx, nfy, nfz = f_vjp(ones)

    denom = vx * nfx + vy * nfy + vz * nfz
    safe = jnp.where(
        jnp.abs(denom) < denom_eps,
        jnp.where(denom < 0, -denom_eps, denom_eps),
        denom,
    )
    hit = jnp.logical_and(jnp.abs(d_star) < hit_threshold, valid)
    g_dot_v = gx * vx + gy * vy + gz * vz
    w = jnp.where(hit, -g_dot_v / safe, jnp.zeros_like(g_dot_v))

    gtheta_march, gmats_march, _, _, _ = f_vjp(w)
    gtheta = gtheta + gtheta_march
    gmats = jax.tree_util.tree_map(jnp.add, gmats, gmats_march)

    t_star = (x - px) * vx + (y - py) * vy + (z - pz) * vz
    gp0x, gp0y, gp0z = gx + nfx * w, gy + nfy * w, gz + nfz * w
    rays7_cot = jnp.stack(
        [
            gp0x, gp0y, gp0z,
            t_star * gp0x, t_star * gp0y, t_star * gp0z,
            jnp.zeros_like(gx),
        ],
        axis=0,
    )
    return gtheta, gmats, rays7_cot


fused_march_normals_ift.defvjp(_ift_fwd, _ift_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7, 8, 9, 10)
)
def fused_march_normals_cov_ift(sdf_c, rebuild, flat_params, mats, rays7,
                                steps, tau, normals_eps, interpret,
                                hit_threshold=0.05, denom_eps=1e-6):
    """Coverage variant with O(1) backward: IFT endpoint gradients for the
    8 render planes plus **argmin-frozen** min_f gradients —
    ``∂min_f/∂θ ≈ f_θ(θ, p_m)`` with the argmin position ``p_m`` (an extra
    kernel output) treated as constant. The fused counterpart of
    :func:`ray_marching_tpu.render.implicit.march_with_closest_implicit`;
    the exact path (:func:`fused_march_normals_cov`) remains the default."""
    return fused_march_normals_cov(
        sdf_c, rebuild, flat_params, mats, rays7, steps, tau, normals_eps,
        interpret
    )


def _cov_ift_fwd(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                 normals_eps, interpret, hit_threshold, denom_eps):
    out, _, _, argpos, _ = _call_render_kernel(
        _split_sdf(sdf_c)[1], rebuild, flat_params, mats, rays7, steps,
        tau, normals_eps, interpret, True, track_argpos=True,
    )
    return out, (flat_params, mats, rays7, out, argpos)


def _cov_ift_bwd(sdf_c, rebuild, steps, tau, normals_eps, interpret,
                 hit_threshold, denom_eps, residuals, g):
    sdf_c = _split_sdf(sdf_c)[0]  # jnp autodiff below: plain SDF only
    flat_params, mats, rays7, out, argpos = residuals
    # Endpoint planes: identical routing to _ift_bwd (it reads g[0..7]).
    gtheta, gmats, rays7_cot = _ift_bwd(
        sdf_c, rebuild, steps, tau, normals_eps, interpret, hit_threshold,
        denom_eps, (flat_params, mats, rays7, out), g,
    )
    # min_f, argmin frozen: one joint VJP of f at p_m; the position route
    # p_m = p0 + t_m·v (t_m frozen) carries the cotangent to the ray.
    valid = rays7[6] > 0.5
    gminf = jnp.where(valid, g[8], jnp.zeros_like(g[8]))
    xm, ym, zm = argpos[0], argpos[1], argpos[2]

    def f_only(flat, mats, x, y, z):
        return sdf_c(rebuild(flat, mats), x, y, z)

    _, f_vjp = jax.vjp(f_only, flat_params, mats, xm, ym, zm)
    dtheta, dmats, gmx, gmy, gmz = f_vjp(gminf)
    px, py, pz, vx, vy, vz = (rays7[i] for i in range(6))
    t_m = (xm - px) * vx + (ym - py) * vy + (zm - pz) * vz
    add = jnp.stack(
        [gmx, gmy, gmz, t_m * gmx, t_m * gmy, t_m * gmz,
         jnp.zeros_like(gmx)],
        axis=0,
    )
    gmats = jax.tree_util.tree_map(jnp.add, gmats, dmats)
    return gtheta + dtheta, gmats, rays7_cot + add


fused_march_normals_cov_ift.defvjp(_cov_ift_fwd, _cov_ift_bwd)
