"""XLA-native march+normals with the fused-kernel plane contract.

The fused Pallas mega-kernel (:mod:`ray_marching_tpu.ops.pallas_render`)
is the right tool for analytic scenes: sqrt-dense VPU work, everything
VMEM-resident, measured at elementwise speed-of-light
(docs/PERFORMANCE.md). For **matmul** scenes (wide ``NeuralSDF`` MLPs)
the balance shifts: the MLP wants XLA's native MXU matmul tiling/fusion,
and the kernel's per-evaluation ``(rows, 128) → (1, rows·128)`` Mosaic
relayouts become overhead. Measured head-to-head on the chip
(docs/PERFORMANCE.md, "XLA vs fused march", round 4): XLA wins every
FORWARD at widths 16–256 and compiles 10–20× faster; the fused kernel
wins wide TRAINING (see the table for the crossover and the
``march_impl='fused'`` override guidance). This module provides the
same four entry points as ``pallas_render`` with identical signatures and
plane contracts, evaluated by XLA:

- :func:`xla_march_normals` — rays7 ``(7, R, 128)`` →
  ``(8, R, 128)``: x y z d nx ny nz lap.
- :func:`xla_march_normals_cov` — + the along-ray closest-approach
  ``min_f`` plane → ``(9, R, 128)``.
- :func:`xla_march_normals_ift` / :func:`xla_march_normals_cov_ift` —
  O(1) implicit-function-theorem backwards, REUSING the pallas module's
  closed-form VJPs (``_ift_bwd`` / ``_cov_ift_bwd`` are pure jnp and
  forward-agnostic: they read only endpoint residuals).

Forward math is :func:`pallas_render._reference_fn` — the same function
that serves as the mega-kernel's spec oracle (tests pin the kernel to
it), so the two implementations cannot drift. Backward for the non-IFT
entry points is plain autodiff through the per-step **rematerialized**
scan: residual memory is the position history (exactly what the fused
backward's handoff logs), NOT the per-step MLP activations — which for a
width-64 MLP at 1080p would be ~34 GB and could never fit in HBM.

``FastRenderer(march_impl=...)`` dispatches here (render/fast.py); the
``interpret`` argument is accepted for signature compatibility and
ignored (XLA runs natively on every backend).
"""

from __future__ import annotations

import functools

import jax

from ray_marching_tpu.ops.pallas_render import (
    _cov_ift_bwd,
    _ift_bwd,
    _reference_fn,
)


def xla_march_normals(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                      normals_eps, interpret=False):
    """rays7 (7, rows, 128) → (8, rows, 128): x y z d nx ny nz lap."""
    del interpret
    return _reference_fn(
        sdf_c, rebuild, steps, tau, normals_eps, flat_params, mats, rays7
    )


def xla_march_normals_cov(sdf_c, rebuild, flat_params, mats, rays7, steps,
                          tau, normals_eps, interpret=False):
    """Coverage variant: + min_f plane → (9, rows, 128)."""
    del interpret
    return _reference_fn(
        sdf_c, rebuild, steps, tau, normals_eps, flat_params, mats, rays7,
        track_min=True,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7, 8, 9, 10)
)
def xla_march_normals_ift(sdf_c, rebuild, flat_params, mats, rays7, steps,
                          tau, normals_eps, interpret=False,
                          hit_threshold=0.05, denom_eps=1e-6):
    """IFT endpoint backward (O(1) memory/time) over the XLA forward —
    the exact analogue of ``fused_march_normals_ift``, same VJP."""
    return xla_march_normals(
        sdf_c, rebuild, flat_params, mats, rays7, steps, tau, normals_eps
    )


def _xla_ift_fwd(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                 normals_eps, interpret, hit_threshold, denom_eps):
    out = xla_march_normals(
        sdf_c, rebuild, flat_params, mats, rays7, steps, tau, normals_eps
    )
    return out, (flat_params, mats, rays7, out)


def _xla_ift_bwd(sdf_c, rebuild, steps, tau, normals_eps, interpret,
                 hit_threshold, denom_eps, residuals, g):
    return _ift_bwd(
        sdf_c, rebuild, steps, tau, normals_eps, interpret, hit_threshold,
        denom_eps, residuals, g,
    )


xla_march_normals_ift.defvjp(_xla_ift_fwd, _xla_ift_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7, 8, 9, 10)
)
def xla_march_normals_cov_ift(sdf_c, rebuild, flat_params, mats, rays7,
                              steps, tau, normals_eps, interpret=False,
                              hit_threshold=0.05, denom_eps=1e-6):
    """Coverage + IFT: O(1) backward with argmin-frozen min_f gradients —
    the exact analogue of ``fused_march_normals_cov_ift``, same VJP."""
    return xla_march_normals_cov(
        sdf_c, rebuild, flat_params, mats, rays7, steps, tau, normals_eps
    )


def _xla_cov_ift_fwd(sdf_c, rebuild, flat_params, mats, rays7, steps, tau,
                     normals_eps, interpret, hit_threshold, denom_eps):
    # The tracked march is _reference_fn's own step function (track_argpos)
    # — the ONE copy of the step semantics the kernel tests pin; this
    # forward cannot drift from it.
    out, argpos = _reference_fn(
        sdf_c, rebuild, steps, tau, normals_eps, flat_params, mats, rays7,
        track_min=True, track_argpos=True,
    )
    return out, (flat_params, mats, rays7, out, argpos)


def _xla_cov_ift_bwd(sdf_c, rebuild, steps, tau, normals_eps, interpret,
                     hit_threshold, denom_eps, residuals, g):
    return _cov_ift_bwd(
        sdf_c, rebuild, steps, tau, normals_eps, interpret, hit_threshold,
        denom_eps, residuals, g,
    )


xla_march_normals_cov_ift.defvjp(_xla_cov_ift_fwd, _xla_cov_ift_bwd)
