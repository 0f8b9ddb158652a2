"""Implicit-function-theorem backward for the sphere-tracing fixed point.

At convergence the marched point satisfies ``p* = p0 + t*·v`` with
``f(θ, p*) = 0``. Differentiating the hit condition gives

    ∂t*/∂θ  = −f_θ / (v·∇f),    ∂t*/∂p0 = −∇f / (v·∇f),
    ∂t*/∂v  = −t*·∇f / (v·∇f),

so the backward pass needs **one** SDF VJP at the endpoint instead of
backprop through the whole unrolled march — O(1) instead of O(steps) in
both time and memory (SURVEY.md §7 backward mode 3; the unrolled/scan
modes in :mod:`ray_marching_tpu.render.march` remain the exact-parity
default).

Caveats handled here:
* the denominator ``v·∇f`` vanishes for grazing rays — clamped away from 0;
* rays that never converged (``|f(p*)|`` large) have no fixed point — their
  parameter gradients are masked to zero (``hit_threshold``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ray_marching_tpu.render import march as march_mod


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7))
def march_implicit(sdf_vec, params, ray_positions, ray_directions,
                   steps: int, tau: float = 0.0, hit_threshold: float = 0.05,
                   denom_eps: float = 1e-6):
    """March with IFT gradients. Same forward as :func:`march.march`."""
    return march_mod.march(
        sdf_vec, params, ray_positions, ray_directions, steps, tau=tau
    )


def _fwd(sdf_vec, params, ray_positions, ray_directions, steps, tau,
         hit_threshold, denom_eps):
    p_star = march_mod.march(
        sdf_vec, params, ray_positions, ray_directions, steps, tau=tau
    )
    return p_star, (params, p_star, ray_positions, ray_directions)


def _bwd(sdf_vec, steps, tau, hit_threshold, denom_eps, residuals, g):
    params, p_star, p0, v = residuals

    # One joint VJP of f at the endpoint gives both ∇f (via position
    # cotangent) and the params cotangent for any scalar weight field.
    f_val, pullback = jax.vjp(lambda th, p: sdf_vec(th, p), params, p_star)
    ones = jnp.ones_like(f_val)
    _, grad_f = jax.vjp(lambda p: sdf_vec(params, p), p_star)
    (nabla_f,) = grad_f(ones)

    denom = jnp.sum(v * nabla_f, axis=-1, keepdims=True)
    safe = jnp.where(jnp.abs(denom) < denom_eps,
                     jnp.where(denom < 0, -denom_eps, denom_eps), denom)
    hit = jnp.abs(f_val) < hit_threshold

    g_dot_v = jnp.sum(g * v, axis=-1, keepdims=True)
    w = jnp.where(hit, -g_dot_v / safe, jnp.zeros_like(g_dot_v))

    params_cot, _ = pullback(w)

    # Signed travel distance (rays can march backwards out of negative-SDF
    # starts): project the displacement onto the unit direction.
    t_star = jnp.sum((p_star - p0) * v, axis=-1, keepdims=True)
    p0_cot = g + nabla_f * w
    v_cot = t_star * (g + nabla_f * w)
    return params_cot, p0_cot, v_cot


march_implicit.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Coverage variant: IFT endpoint gradients + argmin-frozen min_f gradients.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7))
def march_with_closest_implicit(sdf_vec, params, ray_positions,
                                ray_directions, steps: int, tau: float = 0.0,
                                hit_threshold: float = 0.05,
                                denom_eps: float = 1e-6):
    """:func:`march.march_with_closest` forward with O(1) backward.

    The marched endpoint gets the same IFT routing as
    :func:`march_implicit`; the closest approach ``min_f = min_i f(p_i)``
    gets the **argmin-frozen** rule: ``∂min_f/∂θ ≈ f_θ(θ, p_m)`` with the
    argmin position ``p_m`` treated as a constant (the DIST-style soft-mask
    gradient — the trajectory dependence of *where* the closest approach
    happens is dropped, the dependence of the field value there is kept;
    exact for the shape term whenever the argmin is an interior minimum,
    since ∇f·∂p_m/∂θ = 0 there to first order). O(2) SDF VJPs per frame
    instead of the O(steps) reverse sweep — silhouette-aware training at
    IFT speed. The exact path (autodiff through the scan / the fused
    backward kernel) remains the default.
    """
    p_star, min_f = march_mod.march_with_closest(
        sdf_vec, params, ray_positions, ray_directions, steps, tau=tau
    )
    return p_star, min_f


def _march_closest_argmin(sdf_vec, params, ray_positions, ray_directions,
                          steps, tau):
    """Forward march tracking (p*, min_f, argmin position p_m)."""

    def step(carry, _):
        p, min_f, p_m = carry
        d = sdf_vec(params, p)
        take = d < min_f
        p_m = jnp.where(take, p, p_m)
        min_f = jnp.where(take, d, min_f)
        if tau != 0.0:
            done = jnp.abs(d) < tau
            p_next = jnp.where(done, p, p + d * ray_directions)
        else:
            p_next = p + d * ray_directions
        return (p_next, min_f, p_m), None

    big = jnp.full(ray_positions.shape[:-1] + (1,), jnp.finfo(
        ray_positions.dtype).max, ray_positions.dtype)
    (p_star, min_f, p_m), _ = jax.lax.scan(
        step, (ray_positions, big, ray_positions), None, length=steps
    )
    return p_star, min_f, p_m


def _fwd_cov(sdf_vec, params, ray_positions, ray_directions, steps, tau,
             hit_threshold, denom_eps):
    p_star, min_f, p_m = _march_closest_argmin(
        sdf_vec, params, ray_positions, ray_directions, steps, tau
    )
    return (p_star, min_f), (params, p_star, p_m, ray_positions,
                             ray_directions)


def _bwd_cov(sdf_vec, steps, tau, hit_threshold, denom_eps, residuals, g):
    params, p_star, p_m, p0, v = residuals
    g_p, g_minf = g

    # Endpoint: identical routing to march_implicit._bwd.
    f_val, pullback = jax.vjp(lambda th, p: sdf_vec(th, p), params, p_star)
    ones = jnp.ones_like(f_val)
    _, grad_f = jax.vjp(lambda p: sdf_vec(params, p), p_star)
    (nabla_f,) = grad_f(ones)
    denom = jnp.sum(v * nabla_f, axis=-1, keepdims=True)
    safe = jnp.where(jnp.abs(denom) < denom_eps,
                     jnp.where(denom < 0, -denom_eps, denom_eps), denom)
    hit = jnp.abs(f_val) < hit_threshold
    g_dot_v = jnp.sum(g_p * v, axis=-1, keepdims=True)
    w = jnp.where(hit, -g_dot_v / safe, jnp.zeros_like(g_dot_v))
    params_cot, _ = pullback(w)
    t_star = jnp.sum((p_star - p0) * v, axis=-1, keepdims=True)
    p0_cot = g_p + nabla_f * w
    v_cot = t_star * (g_p + nabla_f * w)

    # min_f, argmin frozen: one more joint VJP of f at p_m. The position
    # route p_m = p0 + t_m·v (t_m frozen) carries the cotangent to the ray.
    _, pullback_m = jax.vjp(lambda th, p: sdf_vec(th, p), params, p_m)
    params_cot_m, pm_cot = pullback_m(g_minf)
    params_cot = jax.tree_util.tree_map(
        jnp.add, params_cot, params_cot_m
    )
    t_m = jnp.sum((p_m - p0) * v, axis=-1, keepdims=True)
    p0_cot = p0_cot + pm_cot
    v_cot = v_cot + t_m * pm_cot
    return params_cot, p0_cot, v_cot


march_with_closest_implicit.defvjp(_fwd_cov, _bwd_cov)
