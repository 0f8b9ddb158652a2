"""Soft silhouette coverage: differentiable hit/miss for sphere tracing.

**The stall this fixes.** Backprop through the unrolled march gives exact
gradients *for rays that hit*: the hit point moves smoothly with the scene
parameters. But whether a ray hits at all is a step function — a ray that
misses diverges to astronomical distances and carries (numerically) zero
parameter gradient, and a ray that hits a surface whose shading is locally
parameter-independent (a flat wall under the lambertian shader, reference
shader.py:12-20) carries zero too. All the information about object
*extent* lives exactly at the silhouette, where plain pixel losses see
nothing; pixel-only shape/pose optimization stalls (the round-1 ROADMAP #1
weakness, documented in tools/train_neural_demo.py; the reference README
advertises backprop-through-render but ships no working optimization,
README.md:22-23).

**The fix.** Track the along-ray closest approach ``min_f = min_i f(p_i)``
during the march (:func:`ray_marching_tpu.render.march.march_with_closest`
— one extra ``minimum`` per step, free on the VPU) and relax visibility to

    α = σ(shift − min_f / β)

Sphere tracing converges from outside, so hit rays bottom out at
``min_f → 0⁺`` (never negative) — the sigmoid must be *shifted* to put
hits on its saturated side: with the default ``shift = 4``, hits give
α = σ(4) ≈ 0.982, clear misses (``min_f ≫ β``) give α ≈ 0, and near the
silhouette α transitions smoothly. Crucially ``∂min_f/∂θ`` is
well-defined through the arg-min march step, so moving/growing the object
toward a ray *increases its coverage differentiably*. Compositing
``α·image + (1−α)·background`` restores silhouette gradients to any pixel
loss. This is the standard soft-mask relaxation of differentiable sphere
tracing (DIST, CVPR 2020; SoftRas-style sigmoid masks) and the baseline
the reparameterization paper (PAPERS.md, arXiv:2206.05344) sharpens; β
trades gradient bandwidth against mask bias, ``shift`` trades interior
fidelity (α_hit = σ(shift)) against how far the gradient band reaches
outside the silhouette (≈ ``shift·β``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_SHIFT = 4.0


def soft_coverage(min_f, beta: float, shift: float = DEFAULT_SHIFT):
    """``α = σ(shift − min_f/β)``: (..., 1) closest approach → (..., 1)
    coverage (hits ≈ σ(shift), clear misses ≈ 0)."""
    return jax.nn.sigmoid(shift - min_f / beta)


def composite(image, alpha, background=0.0):
    """``α·image + (1−α)·background`` — silhouette-aware pixel values."""
    return alpha * image + (1.0 - alpha) * background
