"""SDF→SDF transformations and n-ary combinators as pure functions.

Componentwise, like :mod:`ray_marching_tpu.scene.primitives`. Semantics match
the reference (scene/transformations.py):

* affine       — rigid transform by inverse-transforming queries
                 (reference: scene/transformations.py:8-42)
* smooth_union — soft-min via ``-(1/k)·logsumexp(-k·dᵢ)`` with learnable k
                 (reference: scene/transformations.py:45-71)
* union        — hard min over children (reference: scene/transformations.py:74-94)
* rounding     — ``f(p) - rounding`` inflation (reference: scene/transformations.py:97-118)
* onion        — shell ``|f(p)| - radius`` (reference: scene/transformations.py:121-132)
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_marching_tpu import quat
from ray_marching_tpu.utils import vmin


def affine_inverse_query(orientation, translation, x, y, z):
    """Map world-space queries into the child's local frame.

    Applies the inverse rigid transform: ``p' = R(q̄)(p - t)`` where ``q`` is
    the (unit) orientation quaternion and ``t`` the translation.
    """
    qw, qx, qy, qz = (
        orientation[0],
        -orientation[1],
        -orientation[2],
        -orientation[3],
    )
    return quat.rotate_c(
        qw, qx, qy, qz, x - translation[0], y - translation[1], z - translation[2]
    )


def smooth_union(blend_k, distances):
    """Soft-min of a list of distance planes: ``-(1/k)·logsumexp(-k·dᵢ)``.

    Numerically stable (max-subtracted), with gradients flowing to every
    child weighted by its softmax weight and to ``blend_k`` itself — the
    same routing as torch's logsumexp.
    """
    stacked = jnp.stack(distances, axis=0)
    a = stacked * (-blend_k)
    m = jnp.max(a, axis=0)
    lse = jnp.log(jnp.sum(jnp.exp(a - m[None]), axis=0)) + m
    return lse / (-blend_k)


def union(distances):
    """Hard min over children.

    Uses a select-based min (:func:`ray_marching_tpu.utils.vmin`) so the
    backward pass routes the cotangent only to the winning child (first
    child on ties), exactly like torch's ``stack(...).min(dim=-2)`` — in
    particular a NaN cotangent never leaks into losing children.
    """
    out = distances[0]
    for d in distances[1:]:
        out = vmin(out, d)
    return out


def rounding(radius, d):
    """Inflate a shape by ``radius``: ``d - radius``."""
    return d - radius


def onion(radius, d):
    """Shell of thickness ``radius``: ``|d| - radius``."""
    return jnp.abs(d) - radius
