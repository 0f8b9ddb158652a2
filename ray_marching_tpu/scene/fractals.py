"""Fractal SDF nodes: the Mandelbulb distance estimator as a scene leaf.

A capability demo for :func:`graph.register_custom_node` (no reference
counterpart — the reference's leaves are 6 analytic primitives,
scene/primitives.py): an iterated distance-ESTIMATED field composing with
every CSG operator and the fused Pallas kernels.

The classic Mandelbulb iterates the "triplex power" map
``z <- z^n + c`` in spherical coordinates with the running derivative
``dr <- n·r^{n-1}·dr + 1`` and estimates distance as
``0.5·ln(r)·r/dr`` (Hubbard–Douady potential DE; see e.g. the public
Mandelbulb literature / Quilez's distance-estimator notes).

TPU formulation — exact, but inverse-trig-free: Mosaic has no
``atan2``/``acos`` lowering, so instead of computing the angles we compute
their cosines/sines directly from coordinates

    cos(theta) = z_z / r        sin(theta) = r_xy / r
    cos(phi)   = z_x / r_xy     sin(phi)   = z_y / r_xy

and raise them to the n-th angle with de Moivre via **binary
exponentiation on the unit complex number** ``(cos a, sin a)^n`` —
log2(n) multiply-adds, exact for any integer power, pure elementwise
VPU arithmetic (the identical jaxpr runs under jit, grad, and inside the
Pallas mega-kernel). Every division/log is where-guarded so on-axis and
origin evaluations stay NaN-free in both the primal and the backward
(the guards are select-based: utils.clamp semantics, CLAUDE.md).

``scale`` is a learnable pytree leaf (``f(p) = s·mandelbulb(p/s)``), so
inverse rendering can size the bulb; the power and iteration count are
static node config (baked into the unrolled closure).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ray_marching_tpu.scene.graph import Node, register_custom_node

_EPS2 = 1e-24  # squared-radius guard, applied BEFORE sqrt (backward NaNs)


@dataclass(frozen=True)
class Mandelbulb(Node):
    """Mandelbulb distance-estimator leaf.

    Attributes:
        power: integer triplex power n (8 = the classic bulb). Static.
        iterations: escape-iteration count — more = tighter estimate and
            finer surface detail (and a proportionally bigger unrolled
            kernel). Static.
        escape_radius: bailout |z| beyond which a point is frozen.
        scale: overall size — the one LEARNABLE parameter of the leaf
            (compose with Affine for pose).
    """

    power: int = 8
    iterations: int = 10
    escape_radius: float = 2.0
    scale: float = 1.0


def _unit_complex_ipow(c, s, n: int):
    """(cos a, sin a) -> (cos n·a, sin n·a), exact de Moivre by binary
    exponentiation: O(log n) elementwise multiply-adds, no trig."""
    rc, rs = jnp.ones_like(c), jnp.zeros_like(s)
    while n > 0:
        if n & 1:
            rc, rs = rc * c - rs * s, rs * c + rc * s
        c, s = c * c - s * s, 2.0 * c * s
        n >>= 1
    return rc, rs


def _ipow(x, n: int):
    """x**n for static integer n by binary exponentiation (multiplies only)."""
    acc = None
    while n > 0:
        if n & 1:
            acc = x if acc is None else acc * x
        x = x * x
        n >>= 1
    return acc if acc is not None else jnp.ones_like(x)


def init_mandelbulb_params(node: Mandelbulb, dtype=jnp.float32):
    return {"scale": jnp.asarray(node.scale, dtype=dtype)}


def mandelbulb_sdf(node: Mandelbulb):
    n = int(node.power)
    iters = int(node.iterations)
    bail2 = float(node.escape_radius) ** 2
    if n < 2:
        raise ValueError(f"Mandelbulb power must be >= 2, got {n}")
    # Containment radius of the triplex-power set: if |c| > 2^(1/(n-1)) then
    # z = c already satisfies |z^n + c| >= |c|(|c|^(n-1) - 1) > |c| and the
    # orbit diverges, so the set lies inside this sphere.
    set_radius = 2.0 ** (1.0 / (n - 1))

    def evaluate(params, x, y, z):
        s = params["scale"]
        inv = 1.0 / s
        cx, cy, cz = x * inv, y * inv, z * inv
        zx, zy, zz = cx, cy, cz
        dr = jnp.ones_like(x)
        r2 = zx * zx + zy * zy + zz * zz
        # Guard BEFORE the sqrt: sqrt(0)'s VJP is g/(2*sqrt(0)) = inf, and a
        # where AFTER the sqrt cannot kill it (the 0*NaN backward gotcha,
        # CLAUDE.md) — on-axis/origin evaluations must stay NaN-free in the
        # backward, not just the primal.
        r0 = jnp.sqrt(jnp.where(r2 < _EPS2, _EPS2, r2))
        one = jnp.ones_like(x)
        for _ in range(iters):
            live = r2 <= bail2
            rg = jnp.sqrt(jnp.where(r2 < _EPS2, _EPS2, r2))
            rxy2 = zx * zx + zy * zy
            on_axis = rxy2 < _EPS2
            rxyg = jnp.sqrt(jnp.where(on_axis, _EPS2, rxy2))
            ct, st = zz / rg, rxyg / rg
            cp = jnp.where(on_axis, one, zx / rxyg)
            sp = jnp.where(on_axis, jnp.zeros_like(x), zy / rxyg)
            ctn, stn = _unit_complex_ipow(ct, st, n)
            cpn, spn = _unit_complex_ipow(cp, sp, n)
            rn1 = _ipow(rg, n - 1)
            rn = rn1 * rg
            dr_new = n * rn1 * dr + 1.0
            zx = jnp.where(live, rn * stn * cpn + cx, zx)
            zy = jnp.where(live, rn * stn * spn + cy, zy)
            zz = jnp.where(live, rn * ctn + cz, zz)
            dr = jnp.where(live, dr_new, dr)
            r2 = zx * zx + zy * zy + zz * zz
        rg = jnp.sqrt(jnp.where(r2 < _EPS2, _EPS2, r2))
        de = 0.5 * jnp.log(rg) * rg / dr
        # Far field: for query points that escape immediately (dr == 1) the
        # potential estimate 0.5*r*ln(r) OVERSHOOTS the true distance once
        # r >~ 4.8 (it grows superlinearly), so sphere tracing would punch
        # through. The set is contained in |p| <= set_radius, making
        # r - set_radius a guaranteed underestimate — bind it outside the
        # bailout sphere (select-form min keeps the backward NaN-free).
        bound = r0 - set_radius
        far = jnp.where(de < bound, de, bound)
        de = jnp.where(r0 > node.escape_radius, far, de)
        return de * s

    return evaluate


register_custom_node(Mandelbulb, mandelbulb_sdf, init_mandelbulb_params)
