"""Fully-fused Pallas backward kernel for the march+normals mega-kernel.

The generic backward (checkpointed-scan recompute) streams 32 steps of ray
positions through HBM twice. This kernel keeps the ENTIRE reverse sweep in
VMEM per ray tile:

  1. obtain the march position history — either handed over from the
     differentiated forward kernel (``hist`` arg; tau == 0) or recomputed
     in-kernel into a VMEM scratch (steps × 3 × TILE × 128 — ~6 MB at
     TILE=128);
  2. fold the tail cotangents (terminal distance, normals, Laplacian) into
     the endpoint cotangent with one ``jax.vjp`` of the tail block;
  3. run the reverse-mode sweep step-by-step from the history, accumulating
     the parameter cotangent (a (P,)-vector) and the ray-direction
     cotangent on the fly.

``jax.vjp`` is traced *inside* the kernel body — linearization happens at
trace time, so the transposed ops are ordinary elementwise VPU ops like the
primal ones. Parameter cotangents exit as one (num_tiles, P) array summed
by the caller.

tau > 0 (early exit) applies the forward's per-step freeze mask in the
recompute and the reverse sweep, and — without a coverage plane — both
sweeps stop at the tile's exit step (frozen-tail steps are identity maps
with identity VJPs, so the skip is exact).
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


def _store_gtheta_leaves(gtheta_ref, gsmall, specs, dtype):
    """Spill the small-leaf cotangent TUPLE across the tile's (gr, 128)
    output block. Each leaf occupies whole rows (split_params_padded
    aligns every segment to 128 lanes), so every store is a partial-lane
    2-D ref write at lane offset 0 — the only spill pattern Mosaic
    accepts (1-D concatenates whose result crosses a lane tile fail to
    lower regardless of alignment; jnp newaxis+slice indexing emits 1-D
    gathers; both probed on v5e)."""
    gtheta_ref[:] = jnp.zeros(gtheta_ref.shape, dtype)
    for (off, size, _), g in zip(specs, gsmall):
        g1 = g.reshape(-1).astype(dtype)
        pos = 0
        while pos < size:
            row = (off + pos) // LANES
            n = min(LANES, size - pos)
            gtheta_ref[row:row + 1, 0:n] = g1[pos:pos + n][None, :]
            pos += n


# Round-4 re-sweep WITH the history handoff + 8-way unrolled reverse
# sweep (1080p exact fwd+bwd, 3 interleaved repeats, fwd tile 64):
# bwd 32 → 7.99 ms (winner), 64 → 8.24, 128 → 8.10; the round-2 sweep
# below predates the handoff and chose 128 — superseded.
BWD_ROWS_PER_TILE = 32
# Scoped-VMEM budget for the backward kernel. The Mosaic default (16 MiB)
# caps the tile at 64 rows (position history + reverse-sweep VJP
# temporaries); v5e VMEM is 128 MiB physical, so a raised budget admits
# larger tiles. Round-2 measured sweep (tools/bwd_tile_sweep.py, 1080p
# fwd+bwd, v5e, pre-handoff): 64/16M 13.2 ms, 128/64M 12.2 ms,
# 192/96M 13.4 ms, 256 worse — see docs/PERFORMANCE.md.
BWD_VMEM_LIMIT_BYTES = 64 * 2**20
# Two-level recompute: log every K-th position only, re-march segments
# during the reverse sweep. Scratch drops from steps×3 to (steps/K + K)×3
# planes per tile. Measured slower than full history at every tile size
# once the VMEM budget is raised (128 rows: 14.0 vs 12.2 ms) — the segment
# re-march costs more than the smaller scratch saves. Kept as an opt-in
# experiment (RM_TPU_BWD_TWO_LEVEL=1).
CKPT_INTERVAL = 8
BWD_ROWS_PER_TILE_2L = 128
MAX_UNROLL_STEPS = 64
# Partial unroll of the reverse VJP sweep: inline up to this many traced-VJP
# steps per loop trip (Mosaic's fori_loop only supports none/full unroll, so
# the unrolling is manual). Applied only for static trip counts (not the
# tau-early-exit while_loop), at the largest divisor of the step count ≤ the
# cap. Sweep at 1080p/32 steps (tools/bwd_tile_sweep.py ...:uK): u1 9.8 ms,
# u2 9.7, u4 9.9, u8 9.37 (winner, reproduced), u16 9.45, u32 (full) 10.5 —
# and full unroll of the OLD recompute+sweep kernel blew Mosaic compile past
# 8 min (round 1); with the march-history handoff the sweep-only body stays
# compileable (~20-30 s) at every factor.
BWD_UNROLL = 8
# Trace-time record of the most recent fused_backward configuration —
# which path actually ran (handoff vs recompute vs two-level) is decided
# by shape/env checks that can silently flip, so tools/tests read this
# instead of guessing (tools/bwd_tile_sweep.py labels its rows with it).
LAST_PATH: dict = {}


def two_level_engages(steps, tau=0.0, track_min=False) -> bool:
    """Single source of truth for when the RM_TPU_BWD_TWO_LEVEL experiment
    actually engages — the forward's history-logging decision
    (pallas_render._hist_enabled) must agree with fused_backward, or a
    multi-GB history gets materialized and discarded (or withheld, silently
    dropping to the slow recompute)."""
    import os

    k = CKPT_INTERVAL
    return (
        os.environ.get("RM_TPU_BWD_TWO_LEVEL", "0") == "1"
        and steps % k == 0
        and steps >= 2 * k
        and not track_min  # coverage routing needs the full history
        and tau == 0.0  # the 2l experiment never grew a tau mask
    )


def _bwd_kernel(sdf_c, sdf_fwd, rebuild, steps, tau, normals_eps, offsets,
                inverse, track_min, use_hist, n_mats,
                params_ref, *all_refs):
    """``sdf_fwd`` (possibly the union-pruned forward-only compile) is
    used ONLY in the non-differentiated forward recompute below, so its
    trajectories stay bitwise-identical to the forward kernel's whether
    the history handoff engages or not; everything touched by jax.vjp
    (tail, step_fn) uses the plain ``sdf_c``."""
    from ray_marching_tpu.ops.pallas_render import _normals_block

    mat_refs, all_refs = all_refs[:n_mats], all_refs[n_mats:]
    (px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, valid_ref,
     g_ref, *refs) = all_refs
    if use_hist:
        # History logged by the forward kernel (pallas_render._march_tile):
        # pre-step positions 0..steps-1 plus the terminal position at
        # [steps] — the whole forward recompute below is skipped. With
        # track_min the forward also hands over min_f and its arg-min step;
        # with tau > 0 it hands over the tile's exit step (broadcast over
        # an int32 plane: how many history planes are live).
        refs = list(refs)
        hist_ref = refs.pop(0)
        minf_in_ref = refs.pop(0) if track_min else None
        amin_in_ref = refs.pop(0) if track_min else None
        nact_in_ref = refs.pop(0) if tau != 0.0 else None
    else:
        refs = list(refs)
        hist_ref = refs.pop()  # VMEM scratch trails the outputs
    (gx0_ref, gy0_ref, gz0_ref, gvx_ref, gvy_ref, gvz_ref,
     gtheta_ref, *gmat_refs) = refs

    flat = params_ref[0, :]
    mats = tuple(r[:] for r in mat_refs)
    # Differentiate w.r.t. the small-leaf TUPLE, not the flat vector: the
    # flat cotangent would need a 1-D concatenate (transpose of the
    # unravel's split) that Mosaic cannot lower past one lane tile.
    small0 = rebuild.split_small(flat)
    params = rebuild.assemble(small0, mats)
    x, y, z = px_ref[:], py_ref[:], pz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    valid = valid_ref[:] > 0.5
    zero = jnp.zeros((), x.dtype)

    def live_mask(d):
        # tau > 0 freezes converged rays exactly like the forward march;
        # the mask itself is non-differentiable (treated as constant),
        # matching autodiff of the masked scan step.
        if tau == 0.0:
            return valid
        return jnp.logical_and(jnp.abs(d) >= tau, valid)

    # ---- forward recompute, positions logged to VMEM ----
    # With track_min also recover min_f and the FIRST step attaining it
    # (strict-inequality updates). Ties are NOT measure-zero here: rays
    # that converge land on the surface and re-evaluate d == min_f for
    # every remaining step, and jnp.minimum-chain autodiff halves the
    # cotangent at each tied node — the reverse sweep below reproduces
    # that splitting exactly.
    def fwd_step(i, carry):
        x, y, z = carry[:3]
        hist_ref[i, 0] = x
        hist_ref[i, 1] = y
        hist_ref[i, 2] = z
        d = sdf_fwd(params, x, y, z)
        live = live_mask(d)
        out = (
            jnp.where(live, x + d * dx, x),
            jnp.where(live, y + d * dy, y),
            jnp.where(live, z + d * dz, z),
        )
        if track_min:
            minf, amin = carry[3], carry[4]
            take = d < minf
            out = out + (
                jnp.where(take, d, minf),
                jnp.where(take, lax.convert_element_type(i, jnp.int32), amin),
            )
        return out, jnp.any(live)

    # NOTE: loops stay rolled here — statically unrolling the recompute and
    # especially the 32 traced-VJP reverse steps blows Mosaic compile time
    # past 8 minutes (measured round 1) for a ~10% runtime win at best.
    #
    # With tau > 0 (and no coverage plane) both sweeps stop at the tile's
    # exit step: once every ray is frozen the remaining forward steps are
    # identity maps with identity VJPs, so skipping them is exact. The
    # coverage path cannot skip — the frozen steps' repeated d == min_f
    # evaluations each receive a halved share of the min_f cotangent.
    can_exit = tau != 0.0 and not track_min
    init = (x, y, z)
    if track_min:
        init = init + (
            jnp.full_like(x, jnp.finfo(x.dtype).max),
            jnp.full(x.shape, -1, jnp.int32),
        )
    if use_hist:
        # Terminal position straight from the logged history; trajectories
        # are bitwise identical to what the recompute would produce (same
        # elementwise op sequence in the forward kernel).
        x = hist_ref[steps, 0]
        y = hist_ref[steps, 1]
        z = hist_ref[steps, 2]
        carry = (x, y, z)
        if track_min:
            carry = carry + (minf_in_ref[:], amin_in_ref[:])
        n_active = (
            steps
            if nact_in_ref is None
            # The exit step is broadcast over the plane; reduce one row
            # back to the scalar loop bound (Mosaic has no VMEM scalar
            # loads).
            else jnp.max(nact_in_ref[0:1, :])
        )
    elif can_exit:

        def fwd_cond(carry):
            return jnp.logical_and(carry[0] < steps, carry[-1])

        def fwd_body_w(carry):
            out, any_live = fwd_step(carry[0], carry[1:-1])
            return (carry[0] + 1,) + out + (any_live,)

        carry = lax.while_loop(
            fwd_cond, fwd_body_w, (jnp.int32(0),) + init + (jnp.bool_(True),)
        )
        n_active = carry[0]
        carry = carry[1:-1]
    else:
        carry = lax.fori_loop(0, steps, lambda i, c: fwd_step(i, c)[0], init)
        n_active = steps
    x, y, z = carry[:3]
    minf, amin = (carry[3], carry[4]) if track_min else (None, None)

    # ---- tail: terminal distance + normals + laplacian ----
    def tail(small, mats, x, y, z):
        params = rebuild.assemble(small, mats)
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

    _, tail_vjp = jax.vjp(tail, small0, mats, x, y, z)
    gsmall, gmats, gx, gy, gz = tail_vjp(
        (g_ref[3], g_ref[4], g_ref[5], g_ref[6], g_ref[7])
    )
    gx = gx + g_ref[0]
    gy = gy + g_ref[1]
    gz = gz + g_ref[2]

    # ---- reverse sweep over the march steps ----
    # With track_min the step also emits its SDF evaluation d_i, and the
    # min_f cotangent is distributed over the steps exactly as autodiff of
    # the jnp.minimum chain would: processing in reverse with a carried
    # remainder c, every tied node (d_i == min_f, reached after the first
    # strict attainment) takes c/2 and halves the carry; the first
    # attaining step takes all that remains. The injected cotangent flows
    # into both the parameter cotangent and this step's position cotangent
    # (and from there back through earlier steps).
    def step_fn(small, mats, x, y, z, vx, vy, vz):
        params = rebuild.assemble(small, mats)
        d = sdf_c(params, x, y, z)
        live = live_mask(d)
        out = (
            jnp.where(live, x + d * vx, x),
            jnp.where(live, y + d * vy, y),
            jnp.where(live, z + d * vz, z),
        )
        return out + (d,) if track_min else out

    def bwd_body(j, carry):
        gx, gy, gz, gsmall, gmats, gvx, gvy, gvz, c = carry
        i = n_active - 1 - j
        xi = hist_ref[i, 0]
        yi = hist_ref[i, 1]
        zi = hist_ref[i, 2]
        out, vjp = jax.vjp(step_fn, small0, mats, xi, yi, zi, dx, dy, dz)
        if track_min:
            di = out[3]
            first = amin == i
            tie = jnp.logical_and(di == minf, jnp.logical_not(first))
            gd = jnp.where(first, c, jnp.where(tie, 0.5 * c, jnp.zeros_like(c)))
            c = jnp.where(first, jnp.zeros_like(c), jnp.where(tie, 0.5 * c, c))
            cot = (gx, gy, gz, gd)
        else:
            cot = (gx, gy, gz)
        dsmall, dmats, gx, gy, gz, dvx, dvy, dvz = vjp(cot)
        gsmall = jax.tree_util.tree_map(jnp.add, gsmall, dsmall)
        gmats = jax.tree_util.tree_map(jnp.add, gmats, dmats)
        return (gx, gy, gz, gsmall, gmats,
                gvx + dvx, gvy + dvy, gvz + dvz, c)

    gvz0 = jnp.zeros_like(gx)
    c0 = (
        jnp.where(valid, g_ref[8], jnp.zeros_like(gx))
        if track_min
        else gvz0
    )
    # Manual partial unroll of the reverse sweep (see BWD_UNROLL): largest
    # divisor of the static trip count within the cap. The dynamic
    # tau-early-exit count from the forward handoff is segment-aligned
    # (n_active ≡ steps mod EXIT_SEG), so after a rolled prologue of the
    # static remainder it unrolls by a divisor of EXIT_SEG; the in-kernel
    # recompute's per-step-granular count stays rolled.
    bwd_init = (gx, gy, gz, gsmall, gmats, gvz0, gvz0, gvz0, c0)
    u = 1
    tail0 = 0
    if isinstance(n_active, int) and n_active > 0:
        u = max(
            d
            for d in range(1, min(BWD_UNROLL, n_active) + 1)
            if n_active % d == 0
        )
    elif use_hist and tau != 0.0:
        from ray_marching_tpu.ops.pallas_render import EXIT_SEG

        tail0 = steps % EXIT_SEG
        u = max(
            d
            for d in range(1, min(BWD_UNROLL, EXIT_SEG) + 1)
            if EXIT_SEG % d == 0
        )
    if u > 1:
        carry = (
            lax.fori_loop(0, tail0, bwd_body, bwd_init) if tail0
            else bwd_init
        )

        def bwd_body_u(jj, carry):
            for k in range(u):
                carry = bwd_body(tail0 + jj * u + k, carry)
            return carry

        gx, gy, gz, gsmall, gmats, gvx, gvy, gvz, _ = lax.fori_loop(
            0, (n_active - tail0) // u, bwd_body_u, carry
        )
    else:
        gx, gy, gz, gsmall, gmats, gvx, gvy, gvz, _ = lax.fori_loop(
            0, n_active, bwd_body, bwd_init
        )

    gx0_ref[:] = gx
    gy0_ref[:] = gy
    gz0_ref[:] = gz
    gvx_ref[:] = gvx
    gvy_ref[:] = gvy
    gvz_ref[:] = gvz
    _store_gtheta_leaves(gtheta_ref, gsmall, rebuild.specs, x.dtype)
    for ref, gm in zip(gmat_refs, gmats):
        ref[:] = gm[None]


def _bwd_kernel_2l(sdf_c, sdf_fwd, rebuild, steps, normals_eps, offsets,
                   inverse, n_mats, params_ref, *all_refs):
    """Two-level-recompute variant of :func:`_bwd_kernel` (steps % K == 0).
    Same sdf split: ``sdf_fwd`` for the non-differentiated segment
    recomputes, plain ``sdf_c`` under jax.vjp."""
    from ray_marching_tpu.ops.pallas_render import _normals_block

    mat_refs, all_refs = all_refs[:n_mats], all_refs[n_mats:]
    (px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, valid_ref, g_ref,
     gx0_ref, gy0_ref, gz0_ref, gvx_ref, gvy_ref, gvz_ref,
     gtheta_ref, *rest) = all_refs
    *gmat_refs, ckpt_ref, seg_ref = rest
    k = CKPT_INTERVAL
    n_seg = steps // k
    flat = params_ref[0, :]
    mats = tuple(r[:] for r in mat_refs)
    small0 = rebuild.split_small(flat)
    params = rebuild.assemble(small0, mats)
    x, y, z = px_ref[:], py_ref[:], pz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    valid = valid_ref[:] > 0.5
    zero = jnp.zeros((), x.dtype)

    def advance(carry):
        x, y, z = carry
        d = sdf_fwd(params, x, y, z)
        return (
            jnp.where(valid, x + d * dx, x),
            jnp.where(valid, y + d * dy, y),
            jnp.where(valid, z + d * dz, z),
        )

    # ---- forward recompute, one checkpoint per segment ----
    def fwd_seg(s, carry):
        x, y, z = carry
        ckpt_ref[s, 0] = x
        ckpt_ref[s, 1] = y
        ckpt_ref[s, 2] = z
        return lax.fori_loop(0, k, lambda _, c: advance(c), (x, y, z))

    x, y, z = lax.fori_loop(0, n_seg, fwd_seg, (x, y, z))

    # ---- tail cotangents (same as the full-history kernel) ----
    def tail(small, mats, x, y, z):
        params = rebuild.assemble(small, mats)
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

    _, tail_vjp = jax.vjp(tail, small0, mats, x, y, z)
    gsmall, gmats, gx, gy, gz = tail_vjp(
        (g_ref[3], g_ref[4], g_ref[5], g_ref[6], g_ref[7])
    )
    gx = gx + g_ref[0]
    gy = gy + g_ref[1]
    gz = gz + g_ref[2]

    def step_fn(small, mats, x, y, z, vx, vy, vz):
        params = rebuild.assemble(small, mats)
        d = sdf_c(params, x, y, z)
        return (
            jnp.where(valid, x + d * vx, x),
            jnp.where(valid, y + d * vy, y),
            jnp.where(valid, z + d * vz, z),
        )

    # ---- reverse sweep: re-march each segment, then backprop through it ----
    def bwd_seg(si, carry):
        gx, gy, gz, gsmall, gmats, gvx, gvy, gvz = carry
        s = n_seg - 1 - si
        x = ckpt_ref[s, 0]
        y = ckpt_ref[s, 1]
        z = ckpt_ref[s, 2]

        def log_seg(j, carry):
            x, y, z = carry
            seg_ref[j, 0] = x
            seg_ref[j, 1] = y
            seg_ref[j, 2] = z
            return advance((x, y, z))

        lax.fori_loop(0, k, log_seg, (x, y, z))

        def bwd_step(j, carry):
            gx, gy, gz, gsmall, gmats, gvx, gvy, gvz = carry
            i = k - 1 - j
            _, vjp = jax.vjp(
                step_fn, small0, mats, seg_ref[i, 0], seg_ref[i, 1],
                seg_ref[i, 2], dx, dy, dz,
            )
            dsmall, dmats, gx, gy, gz, dvx, dvy, dvz = vjp((gx, gy, gz))
            gsmall = jax.tree_util.tree_map(jnp.add, gsmall, dsmall)
            gmats = jax.tree_util.tree_map(jnp.add, gmats, dmats)
            return (gx, gy, gz, gsmall, gmats,
                    gvx + dvx, gvy + dvy, gvz + dvz)

        return lax.fori_loop(
            0, k, bwd_step, (gx, gy, gz, gsmall, gmats, gvx, gvy, gvz)
        )

    gvz0 = jnp.zeros_like(gx)
    gx, gy, gz, gsmall, gmats, gvx, gvy, gvz = lax.fori_loop(
        0, n_seg, bwd_seg, (gx, gy, gz, gsmall, gmats, gvz0, gvz0, gvz0)
    )

    gx0_ref[:] = gx
    gy0_ref[:] = gy
    gz0_ref[:] = gz
    gvx_ref[:] = gvx
    gvy_ref[:] = gvy
    gvz_ref[:] = gvz
    _store_gtheta_leaves(gtheta_ref, gsmall, rebuild.specs, x.dtype)
    for ref, gm in zip(gmat_refs, gmats):
        ref[:] = gm[None]


def fused_backward(sdf_c, rebuild, flat_params, mats, rays7, g8, steps,
                   normals_eps, interpret, track_min=False, tau=0.0,
                   hist=None, minf=None, amin=None, nact=None):
    """Backward of fused_march_normals.

    Args:
        sdf_c: a componentwise SDF, or a ``(plain, forward-only)`` pair
            (ops/pallas_render._split_sdf): the forward member runs the
            in-kernel position recompute (keeping trajectories bitwise
            equal to the pruned forward kernel whether the history
            handoff engages or not); the plain member is what jax.vjp
            differentiates.
        g8: (8, rows, 128) cotangents for (x y z d nx ny nz lap) — or
            (9, rows, 128) with the coverage plane min_f appended when
            ``track_min`` (fused_march_normals_cov); its cotangent is
            routed to the arg-min march step inside the kernel.
        tau: early-exit threshold; the forward recompute and the reverse
            sweep apply the same per-step freeze mask as the forward march
            (round 2 — tau > 0 previously fell back to the checkpointed-
            scan recompute at ~2.2× the frame time).
        hist: optional (steps+1, 3, rows_padded, 128) march history logged
            by the forward kernel (pallas_render._hist_enabled); when given
            the kernel skips its in-kernel forward recompute — up to
            ``steps`` fewer SDF evaluations per ray, bitwise-identical
            gradients. With ``track_min`` the handoff additionally needs
            ``minf`` (the forward's masked min_f plane, (rows, 128)) and
            ``amin`` (its arg-min step plane, int32, padded rows); with
            tau > 0 it needs ``nact`` (the per-tile exit step broadcast
            over an int32 plane, padded rows — the reverse sweep then stops
            there, and the segment-aligned count lets it partially unroll).

    Returns:
        (flat_params_cot (P,), mats_cot (pytree like ``mats``),
        rays7_cot (7, rows, 128)).
    """
    from ray_marching_tpu.ops.pallas_march import (
        NEURAL_VMEM_LIMIT_BYTES,
        mat_in_specs,
        matmul_width,
    )
    from ray_marching_tpu.ops.pallas_render import _split_sdf

    sdf_c, sdf_fwd = _split_sdf(sdf_c)
    rows = rays7.shape[1]
    dtype = rays7.dtype
    p = flat_params.shape[0]
    offsets, inverse = make_offsets(normals_eps, np_dtype=np.dtype(dtype))
    k = CKPT_INTERVAL
    n_g = 9 if track_min else 8
    width = matmul_width(mats)
    # Opt-in experiment (RM_TPU_BWD_TWO_LEVEL=1): trades the full position
    # history for segment recompute. Measured slower than full history at
    # every tile size once BWD_VMEM_LIMIT_BYTES lifts the scoped-VMEM cap
    # (the segment re-march is pure extra work) — kept only as a memory
    # escape hatch for step counts whose history cannot fit.
    two_level = two_level_engages(steps, tau, track_min)
    use_hist = (
        hist is not None
        and not two_level
        and (tau == 0.0 or (nact is not None and not track_min))
        and (not track_min or (minf is not None and amin is not None))
    )
    if two_level:
        tile = min(BWD_ROWS_PER_TILE_2L, rows)
        kernel = functools.partial(
            _bwd_kernel_2l, sdf_c, sdf_fwd, rebuild, steps, normals_eps,
            offsets, inverse, len(mats),
        )
        scratch = [
            pltpu.VMEM((steps // k, 3, tile, LANES), dtype),  # checkpoints
            pltpu.VMEM((k, 3, tile, LANES), dtype),  # segment replay
        ]
    else:
        tile = min(BWD_ROWS_PER_TILE, rows)
        if width >= 64:
            # Neural scenes: the reverse sweep holds ~20 live
            # (width, tile·128) hidden-block temporaries per VJP step —
            # measured 288 MB of 128 MB physical VMEM at width 64 /
            # tile 128. Scale the ray tile inversely with width
            # (width 64 → 32 rows ≈ 72 MB; width 256 → 8 rows).
            import os

            # Divisor retuned round 5 (was 2048//width): the w64 sweep
            # tied tiles 16 and 32, and sine_fast's extra VJP residuals
            # overflowed the 102M scoped budget at 32 — 1024//width keeps
            # w64 at the tied-fast 16 with ~half the live set.
            ntile = int(os.environ.get(
                "RM_TPU_NEURAL_BWD_TILE", str(max(8, 1024 // width))
            ))
            tile = min(tile, max(8, ntile))
        # Align this kernel's tiling with the FORWARD kernel's padded row
        # count in BOTH modes (handoff and recompute): tile = gcd with
        # that count (stays a multiple of 8 — both are), rays padded to
        # it. This (a) lets the handoff engage at any row count instead
        # of requiring the two kernels' paddings to coincide, and (b)
        # keeps the ray partition — and therefore the per-tile parameter
        # cotangent summation order — identical with the handoff on and
        # off, preserving the bitwise handoff-equality invariant
        # (tests/test_fast.py::test_hist_handoff_backward_bitwise).
        import math

        from ray_marching_tpu.ops.pallas_march import _tile_rows
        from ray_marching_tpu.ops.pallas_render import (
            DEFAULT_ROWS_PER_TILE as _FWD_TILE_DEFAULT,
        )

        # Wide analytic scenes: the reverse sweep's VJP holds ~3x the
        # forward's live plane set (recompute + dH per child), so shrink
        # the ray tile once the packed param vector says the scene is
        # wide (same proxy as the forward's _tile_rows segs cap).
        segs = p // LANES
        if segs > 128:
            tile = min(tile, 16)
        fwd_tile = _tile_rows(rows, width, default=_FWD_TILE_DEFAULT,
                              segs=segs)
        fwd_rows = rows + (-rows % fwd_tile)
        if use_hist and hist.shape[2] != fwd_rows:
            # History from a forward whose tiling this kernel cannot
            # reconstruct (e.g. env overrides changed between passes).
            use_hist = False
        tile = math.gcd(tile, fwd_rows)
        if use_hist and tau != 0.0:
            # The exit-step plane is constant per FORWARD tile, and history
            # planes past a forward tile's exit step are unwritten. A
            # backward tile spanning several forward tiles would apply
            # tile 0's exit step to rows whose history stops earlier —
            # only safe when each backward tile sits inside one forward
            # tile. Check against the ACTUAL forward tile (env overrides
            # like RM_TPU_NEURAL_TILE change it), not the default.
            if fwd_tile % tile != 0:
                use_hist = False
        kernel = functools.partial(
            _bwd_kernel, sdf_c, sdf_fwd, rebuild, steps, tau, normals_eps,
            offsets, inverse, track_min, use_hist, len(mats),
        )
        scratch = [] if use_hist else [
            pltpu.VMEM((steps, 3, tile, LANES), dtype)
        ]
    LAST_PATH.clear()
    LAST_PATH.update(
        use_hist=use_hist, two_level=two_level, tau=tau, tile=tile,
        track_min=track_min,
    )
    # Pad rows to a tile multiple: rays edge-replicated (zero rays would sit
    # at the world origin — a gradient singularity for scenes with a
    # primitive centred there), cotangents zero — so pad rows recompute a
    # benign real march and contribute exactly zero to every accumulator.
    # Non-two-level kernels pad straight to the forward's padded row
    # count (a tile multiple by the gcd adaptation above — the forward
    # may have padded MORE than this kernel's tile alone would; the
    # extra all-pad tiles contribute exact zeros).
    pad = (-rows % tile) if two_level else (fwd_rows - rows)
    if pad:
        rays7 = jnp.pad(rays7, ((0, 0), (0, pad), (0, 0)), mode="edge")
        g8 = jnp.pad(g8, ((0, 0), (0, pad), (0, 0)))
    num_tiles = (rows + pad) // tile
    # The (P,) parameter cotangent spills across ceil(P/128) lane rows,
    # rounded up to the 8-row sublane tile (neural scenes exceed 128).
    gtheta_rows = -(-p // LANES)
    gr = -(-gtheta_rows // 8) * 8
    plane_spec = pl.BlockSpec(
        (tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    params_spec = pl.BlockSpec((1, p), lambda i: (0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec(
        (n_g, tile, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [params_spec] + mat_in_specs(mats) + [plane_spec] * 7 + [g_spec]
    operands = [flat_params[None, :], *mats, *[rays7[i] for i in range(7)], g8]
    if use_hist:
        in_specs.append(
            pl.BlockSpec(
                (steps + 1, 3, tile, LANES),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(hist)
        if track_min:
            # minf arrives caller-shaped (rows,) planes; amin (like hist)
            # is already at the forward kernel's padded row count.
            if pad:
                minf = jnp.pad(minf, ((0, pad), (0, 0)), mode="edge")
            in_specs += [plane_spec, plane_spec]
            operands += [minf, amin]
        if tau != 0.0:
            # The per-tile exit step, broadcast over an int32 plane (same
            # padded rows as hist — guaranteed by the hist shape check).
            in_specs.append(plane_spec)
            operands.append(nact)
    plane_out = jax.ShapeDtypeStruct((rows + pad, LANES), dtype)
    # Per-matrix cotangent outputs: one (1, *shape) block per tile, summed
    # over the tile axis below (same pattern as the gtheta spill rows).
    gmat_specs = [
        pl.BlockSpec(
            (1,) + m.shape,
            (lambda nd: lambda i: (i,) + (0,) * nd)(jnp.ndim(m)),
            memory_space=pltpu.VMEM,
        )
        for m in mats
    ]
    gmat_shapes = [
        jax.ShapeDtypeStruct((num_tiles,) + m.shape, dtype) for m in mats
    ]
    vmem_limit = BWD_VMEM_LIMIT_BYTES
    if mats and vmem_limit is not None:
        vmem_limit = max(vmem_limit, NEURAL_VMEM_LIMIT_BYTES)
    if vmem_limit is not None:
        from ray_marching_tpu.ops.pallas_march import wide_vmem_bytes

        # Wide analytic scenes (see wide_vmem_bytes): the VJP roughly
        # triples the forward's live set, but the shrunken tile (above)
        # compensates; grant the same scaled budget.
        vmem_limit = max(vmem_limit, wide_vmem_bytes(p))
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=[plane_spec] * 6
        + [pl.BlockSpec((gr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + gmat_specs,
        out_shape=[plane_out] * 6
        + [jax.ShapeDtypeStruct((num_tiles * gr, LANES), dtype)]
        + gmat_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=(
            None
            if (vmem_limit is None or interpret)
            else pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
        ),
    )(*operands)
    gx, gy, gz, gvx, gvy, gvz, gtheta_tiles, *gmat_tiles = outs
    if pad:
        gx, gy, gz, gvx, gvy, gvz = (
            a[:rows] for a in (gx, gy, gz, gvx, gvy, gvz)
        )
    rays7_cot = jnp.stack(
        [gx, gy, gz, gvx, gvy, gvz, jnp.zeros_like(gx)], axis=0
    )
    gtheta = jnp.sum(
        gtheta_tiles.reshape(num_tiles, gr * LANES)[:, :p], axis=0
    )
    gmats = tuple(jnp.sum(t, axis=0) for t in gmat_tiles)
    return gtheta, gmats, rays7_cot
