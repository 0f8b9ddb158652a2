"""Small shared numerics utilities."""

from __future__ import annotations

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
