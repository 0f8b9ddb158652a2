"""Quaternion algebra as pure JAX functions.

Quaternions use the wxyz (scalar-first) Hamilton convention, matching the
reference math core (reference: quaternion.py:6-124). Two APIs are provided:

* a vector API on arrays of shape ``(..., 4)`` / ``(..., 3)`` — used by the
  camera, shaders, and controller;
* a componentwise API on scalar-or-array component tuples — used by the scene
  compiler and the Pallas marching kernel, where ray coordinates live in
  separate x/y/z planes so every op is a VPU-friendly elementwise op with no
  last-dim-3 gathers.

Everything here is dtype-preserving and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Vector API: (..., 3) vectors, (..., 4) quaternions
# ---------------------------------------------------------------------------


def cross(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Cross product along the last axis. (reference: quaternion.py:6-21)"""
    return jnp.stack(
        [
            u[..., 1] * v[..., 2] - u[..., 2] * v[..., 1],
            u[..., 2] * v[..., 0] - u[..., 0] * v[..., 2],
            u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0],
        ],
        axis=-1,
    )


def multiply(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two wxyz quaternions. (reference: quaternion.py:24-46)"""
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy + py * qw + pz * qx - px * qz,
            pw * qz + px * qy + pz * qw - py * qx,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate: negate the vector part. (reference: quaternion.py:49-52)"""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotation(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v`` (...,3) by unit quaternions ``q`` (...,4).

    Uses the two-cross-product identity ``v' = v + w·t + q_v × t`` with
    ``t = 2 q_v × v`` — cheaper than the sandwich product.
    (reference: quaternion.py:55-72)
    """
    qv = q[..., 1:]
    t = cross(qv, v) * 2
    return cross(qv, t) + q[..., 0:1] * t + v


def to_versor(v: jnp.ndarray) -> jnp.ndarray:
    """Lift a small vector in the 3-ball to a unit quaternion on S³.

    ``w = sqrt(1 - |v|²)`` is prepended; the caller is responsible for
    keeping ``|v| <= 1`` (NaN otherwise, same contract as the reference).
    (reference: quaternion.py:75-91)
    """
    w = jnp.sqrt(1.0 - jnp.sum(v * v, axis=-1, keepdims=True))
    return jnp.concatenate([w, v], axis=-1)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize along the last axis (eps-free, like F.normalize(eps=0))."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def to_so3(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) of a unit quaternion (..., 4).

    Row layout matches the reference's QuaternionToSO3 module
    (reference: quaternion.py:94-124); unlike the reference this preserves
    leading batch dims instead of flattening to (-1, 3, 3).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = jnp.stack(
        [
            ww + xx - yy - zz, 2 * (xy - wz), 2 * (wy + xz),
            2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx),
            2 * (xz - wy), 2 * (wx + yz), ww - xx - yy + zz,
        ],
        axis=-1,
    )
    return rows.reshape(rows.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Componentwise API: x/y/z planes of identical shape.
# ---------------------------------------------------------------------------


def cross_c(ux, uy, uz, vx, vy, vz):
    """Componentwise cross product; returns (x, y, z) planes."""
    return (uy * vz - uz * vy, uz * vx - ux * vz, ux * vy - uy * vx)


def rotate_c(qw, qx, qy, qz, x, y, z):
    """Rotate component planes (x, y, z) by a (possibly scalar) quaternion.

    Same identity as :func:`rotation`: ``v' = v + w·t + q_v × t`` with
    ``t = 2 q_v × v``.
    """
    tx, ty, tz = cross_c(qx, qy, qz, x, y, z)
    tx, ty, tz = 2 * tx, 2 * ty, 2 * tz
    cx, cy, cz = cross_c(qx, qy, qz, tx, ty, tz)
    return (cx + qw * tx + x, cy + qw * ty + y, cz + qw * tz + z)


def multiply_c(pw, px, py, pz, qw, qx, qy, qz):
    """Componentwise Hamilton product; returns (w, x, y, z) planes."""
    return (
        pw * qw - px * qx - py * qy - pz * qz,
        pw * qx + px * qw + py * qz - pz * qy,
        pw * qy + py * qw + pz * qx - px * qz,
        pw * qz + px * qy + pz * qw - py * qx,
    )
