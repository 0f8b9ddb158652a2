"""Sphere-tracing marcher: the hot loop ``p ← p + f(p)·v``.

The reference runs an unconditional Python-unrolled loop with no early exit
(reference: rendering/ray_marching.py:67-84). Here the loop is a
``lax.scan`` (compiler-friendly, differentiable, O(steps) residuals) with
three extensions the north-star requires:

* **early-exit masking** — rays with ``|f(p)| < tau`` freeze; with
  ``tau = 0`` no ray ever freezes, so the update is exactly the reference's
  unconditional one (exact-parity mode);
* **rematerialized backward** — ``remat=True`` wraps each step in
  ``jax.checkpoint`` so 1024²+ renders backprop in O(√steps)-ish memory;
* **reflection bounces** — mirror reflection at hit points using the
  reference's formula (reference: control.py:179-194), exposed via the
  pipeline.

Backward modes: plain ``scan`` (exact autodiff parity with torch's unrolled
autograd) or rematerialized scan. An implicit-function-theorem VJP at the
fixed point lives in :mod:`ray_marching_tpu.render.implicit`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def march(sdf_vec, params, ray_positions, ray_directions, steps: int,
          *, tau: float = 0.0, remat: bool = False):
    """March ``ray_positions`` along ``ray_directions`` through the scene SDF.

    Args:
        sdf_vec: scene SDF with the ``(..., 3) -> (..., 1)`` convention.
        params: scene parameter pytree.
        ray_positions: (..., 3) start points.
        ray_directions: (..., 3) unit directions.
        steps: static number of marching iterations.
        tau: early-exit threshold; 0 disables masking (reference parity).
        remat: rematerialize each step in the backward pass.

    Returns:
        (..., 3) marched positions.
    """

    if tau == 0.0:

        def step(p, _):
            d = sdf_vec(params, p)
            return p + d * ray_directions, None

    else:

        def step(carry, _):
            p, done = carry
            d = sdf_vec(params, p)
            done = jnp.logical_or(done, jnp.abs(d) < tau)
            p_next = jnp.where(done, p, p + d * ray_directions)
            return (p_next, done), None

    if remat:
        step = jax.checkpoint(step)

    if tau == 0.0:
        final, _ = jax.lax.scan(step, ray_positions, None, length=steps)
        return final
    done0 = jnp.zeros(ray_positions.shape[:-1] + (1,), dtype=bool)
    (final, _), _ = jax.lax.scan(step, (ray_positions, done0), None, length=steps)
    return final


def march_with_closest(sdf_vec, params, ray_positions, ray_directions,
                       steps: int, *, tau: float = 0.0, remat: bool = False):
    """March and track the along-ray **closest approach** ``min_i f(p_i)``.

    The closest approach is the quantity silhouette-aware gradients need:
    for a ray that misses the surface, ``min_f`` is a smooth function of
    the scene parameters (it decreases as the surface moves toward the
    ray), whereas the hit/miss indicator itself is a step function with no
    usable gradient — the documented stall of pixel-only losses in
    differentiable sphere tracing (cf. PAPERS.md, "Differentiable Rendering
    of Neural SDFs through Reparameterization", and the DIST-style soft
    silhouette masks it compares against). ``render/silhouette.py`` turns
    it into a soft coverage mask.

    Returns:
        (marched positions (..., 3), min_f (..., 1)).
    """

    def step(carry, _):
        p, min_f = carry
        d = sdf_vec(params, p)
        if tau != 0.0:
            done = jnp.abs(d) < tau
            p_next = jnp.where(done, p, p + d * ray_directions)
        else:
            p_next = p + d * ray_directions
        return (p_next, jnp.minimum(min_f, d)), None

    if remat:
        step = jax.checkpoint(step)

    big = jnp.full(ray_positions.shape[:-1] + (1,),
                   jnp.finfo(ray_positions.dtype).max, ray_positions.dtype)
    (final, min_f), _ = jax.lax.scan(
        step, (ray_positions, big), None, length=steps
    )
    return final, min_f


def march_unrolled(sdf_vec, params, ray_positions, ray_directions, steps: int):
    """Python-unrolled marcher — bitwise-identical graph to the reference's
    loop (reference: rendering/ray_marching.py:78-84). Used by parity tests;
    prefer :func:`march` (scan) for compile-time at large step counts."""
    p = ray_positions
    for _ in range(steps):
        p = p + sdf_vec(params, p) * ray_directions
    return p


def march_planes(sdf_c, params, px, py, pz, dx, dy, dz, steps: int,
                 *, tau: float = 0.0):
    """Componentwise marcher over coordinate planes (the Pallas-kernel form).

    All arrays share one shape; each step is ``p += f(p)·v`` with optional
    early-exit masking. Returns the marched (x, y, z) planes.
    """

    def step(carry, _):
        x, y, z = carry
        d = sdf_c(params, x, y, z)
        if tau != 0.0:
            live = (jnp.abs(d) >= tau).astype(d.dtype)
            d = d * live
        return (x + d * dx, y + d * dy, z + d * dz), None

    (x, y, z), _ = jax.lax.scan(step, (px, py, pz), None, length=steps)
    return x, y, z


def reflect(ray_directions, surface_normals):
    """Mirror reflection ``v' = v + 2⟨N, −v⟩N``.

    (reference: control.py:179-194 — defined there but never called; exposed
    here as a first-class marcher feature for reflection bounces.)
    """
    proj = jnp.sum(surface_normals * (-ray_directions), axis=-1, keepdims=True)
    return 2.0 * proj * surface_normals + ray_directions
