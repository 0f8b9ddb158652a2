"""SDF primitives as componentwise pure functions.

Each primitive maps query-position planes ``(x, y, z)`` (arrays of identical
shape) plus a parameter dict to a signed-distance plane of the same shape.
Working on separate coordinate planes keeps every op an elementwise VPU op on
TPU — no last-dim-3 layouts, no gathers — and lets the exact same code run
inside Pallas kernels and in plain jnp.

Semantics match the reference formulas exactly, including gradient-routing
details (``where`` masks instead of min/max where the reference uses
``Tensor.where``):

* sphere    — reference: scene/primitives.py:6-17
* box       — reference: scene/primitives.py:20-33
* plane     — reference: scene/primitives.py:36-41 (the plane is x = 0)
* line      — capsule, reference: scene/primitives.py:44-61
* disk      — solid disk, axis x, reference: scene/primitives.py:64-82
* torus     — ring in the xz-plane, reference: scene/primitives.py:85-102
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_marching_tpu.utils import clamp, vmax


def sphere(params, x, y, z):
    """``|p| - radius``. Params: ``radius`` (scalar)."""
    return jnp.sqrt(x * x + y * y + z * z) - params["radius"]


def box(params, x, y, z):
    """Exact box SDF. Params: ``halfsides`` (3,).

    ``|relu(|p| - h)| + min(max_i(|p| - h)_i, 0)`` with gradient routed by
    strict ``> 0`` / ``< 0`` masks, matching the reference's ``Tensor.where``
    calls (reference: scene/primitives.py:29-31).
    """
    h = params["halfsides"]
    qx = jnp.abs(x) - h[0]
    qy = jnp.abs(y) - h[1]
    qz = jnp.abs(z) - h[2]
    q_max = vmax(vmax(qx, qy), qz)
    zero = jnp.zeros((), dtype=qx.dtype)
    rx = jnp.where(qx > 0, qx, zero)
    ry = jnp.where(qy > 0, qy, zero)
    rz = jnp.where(qz > 0, qz, zero)
    outside = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    inside = jnp.where(q_max < 0, q_max, zero)
    return outside + inside


def plane(params, x, y, z):
    """The plane x = 0: distance is just the x component. No params."""
    del params, y, z
    return x


def line(params, x, y, z):
    """Capsule from ``start`` to ``end`` with ``radius``.

    Params: ``start`` (3,), ``end`` (3,), ``radius`` (scalar).
    Projection parameter ``t = clamp(<AP, AB> / |AB|², 0, 1)``.
    """
    s, e, r = params["start"], params["end"], params["radius"]
    abx, aby, abz = e[0] - s[0], e[1] - s[1], e[2] - s[2]
    length2 = abx * abx + aby * aby + abz * abz
    apx, apy, apz = x - s[0], y - s[1], z - s[2]
    t = clamp((apx * abx + apy * aby + apz * abz) / length2, 0.0, 1.0)
    dx = t * abx - apx
    dy = t * aby - apy
    dz = t * abz - apz
    return jnp.sqrt(dx * dx + dy * dy + dz * dz) - r


def disk(params, x, y, z):
    """Solid disk with axis x, radial in (y, z). Params: ``radius`` (scalar)."""
    r_dist = jnp.sqrt(y * y + z * z) - params["radius"]
    rr = jnp.where(r_dist > 0, r_dist, jnp.zeros((), dtype=r_dist.dtype))
    return jnp.sqrt(x * x + rr * rr)


def torus(params, x, y, z):
    """Torus: ring radius ``radius1`` in the xz-plane, tube radius ``radius2``."""
    a = jnp.sqrt(x * x + z * z) - params["radius1"]
    return jnp.sqrt(a * a + y * y) - params["radius2"]
