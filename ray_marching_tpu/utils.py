"""Small shared numerics utilities."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def clamp(x, lo=None, hi=None):
    """Clamp with torch-`clamp` gradient semantics.

    Implemented with ``where`` selections so the backward pass *selects*
    (discarding the incoming cotangent at clamped positions — including NaN
    cotangents) instead of multiplying by a mask the way ``jnp.clip``'s
    min/max formulation does. This matches torch, where e.g. a NaN cotangent
    arriving at a fully-clamped value contributes exactly 0, which golden
    gradient parity depends on (see the distance/proximity shaders'
    ``clamp(·, 1e-2)`` against 0/0-normalized images).

    Boundary values (x == lo or x == hi) keep gradient 1, as in torch.
    """
    if lo is not None:
        x = jnp.where(x < lo, jnp.asarray(lo, x.dtype), x)
    if hi is not None:
        x = jnp.where(x > hi, jnp.asarray(hi, x.dtype), x)
    return x


def vmin(a, b):
    """Elementwise min with torch-`min(dim)` gradient semantics.

    ``jnp.minimum``'s JVP multiplies the cotangent by an equality mask, so a
    NaN cotangent leaks into the *losing* operand (NaN·0 = NaN). torch
    selects instead, routing the cotangent only to the winner and — on ties —
    only to the first operand. ``where(b < a, b, a)`` reproduces both.
    """
    return jnp.where(b < a, b, a)


def vmax(a, b):
    """Elementwise max with torch-`max(dim)` gradient semantics (see vmin)."""
    return jnp.where(b > a, b, a)


@jax.custom_vjp
def rmin(x):
    """Whole-tensor min with torch-`Tensor.min()` gradient semantics.

    ``jnp.min``'s VJP *multiplies* the cotangent by the arg-extremum
    indicator, so a NaN cotangent on the reduction (e.g. the inf − inf at
    the arg-min pixel of the distance shader's ``((x−lo)/(hi−lo))^γ`` —
    pow'(0) = ∞ arriving via both the direct and the −lo path) becomes
    NaN·0 = NaN on EVERY element. torch scatters structurally: the NaN
    stays on the arg-extremum element(s) and everything else keeps exact
    zeros (verified: ties split evenly as g/n_ties, NaN cotangent → NaN
    only on the tied elements). ``where``-select reproduces that.
    """
    return jnp.min(x)


def _rmin_fwd(x):
    m = jnp.min(x)
    return m, (x, m)


def _rmin_bwd(res, g):
    x, m = res
    mask = x == m
    return (jnp.where(mask, g / jnp.sum(mask), jnp.zeros_like(x)),)


rmin.defvjp(_rmin_fwd, _rmin_bwd)


@jax.custom_vjp
def rmax(x):
    """Whole-tensor max with torch-`Tensor.max()` gradient semantics
    (see :func:`rmin`)."""
    return jnp.max(x)


def _rmax_fwd(x):
    m = jnp.max(x)
    return m, (x, m)


def _rmax_bwd(res, g):
    x, m = res
    mask = x == m
    return (jnp.where(mask, g / jnp.sum(mask), jnp.zeros_like(x)),)


rmax.defvjp(_rmax_fwd, _rmax_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def prmin(x, axis_names):
    """Cross-shard whole-tensor min with torch-``Tensor.min()`` gradient
    semantics — the ``shard_map`` analogue of :func:`rmin`.

    ``jax.lax.pmin`` carries no differentiation rule, so composing
    ``rmin`` + ``pmin`` made the explicit-collective shader normalizations
    (reference rendering/shader.py:34-37,51-54,83-84 under sharding)
    non-differentiable. This fuses the local reduce with the collective and
    defines the exact global VJP: the replicated output is consumed on
    every shard, so the per-shard cotangents are psum-summed, then split
    evenly over ALL arg-min elements across every shard — identical to
    :func:`rmin` applied to the unsharded tensor, ties included (the
    distance/proximity shaders' ``clamp(·, 1e-2)`` floor makes cross-shard
    ties routine, so composing the two tie splits would mis-weight them).
    """
    return jax.lax.pmin(jnp.min(x), axis_names)


def _prmin_fwd(x, axis_names):
    m = jax.lax.pmin(jnp.min(x), axis_names)
    return m, (x, m)


def _prmin_bwd(axis_names, res, g):
    x, m = res
    mask = x == m
    n = jax.lax.psum(jnp.sum(mask, dtype=x.dtype), axis_names)
    g = jax.lax.psum(g, axis_names)
    return (jnp.where(mask, g / n, jnp.zeros_like(x)),)


prmin.defvjp(_prmin_fwd, _prmin_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def prmax(x, axis_names):
    """Cross-shard whole-tensor max with torch-``Tensor.max()`` gradient
    semantics (see :func:`prmin`)."""
    return jax.lax.pmax(jnp.max(x), axis_names)


def _prmax_fwd(x, axis_names):
    m = jax.lax.pmax(jnp.max(x), axis_names)
    return m, (x, m)


def _prmax_bwd(axis_names, res, g):
    x, m = res
    mask = x == m
    n = jax.lax.psum(jnp.sum(mask, dtype=x.dtype), axis_names)
    g = jax.lax.psum(g, axis_names)
    return (jnp.where(mask, g / n, jnp.zeros_like(x)),)


prmax.defvjp(_prmax_fwd, _prmax_bwd)
