"""Ambient occlusion and soft-shadow lighting — beyond-parity shaders.

The reference's shader stack is geometric (rendering/shader.py: view-based
lambertian, distance fields, domain colouring); it has no light source, no
occlusion, no shadows. These two extra shader modes add the classic
sphere-tracing illumination tools the reference lacks, built from the same
compiled SDF the marcher uses — each is a handful of extra SDF evaluations
at the hit point, cheap next to the march's 32:

* ``"occlusion"`` — SDF-sampled ambient occlusion: probe the field at a few
  points along the surface normal; wherever the field value falls short of
  the probe height, nearby geometry occludes ambient light.

* ``"shaded"`` — directional-light Lambertian x soft shadow x ambient
  occlusion.  The shadow term sphere-traces a secondary ray toward the
  light and records the *penumbra estimate* ``min(k * f(t) / t)`` along it —
  the standard soft-shadow formulation for SDF scenes (a near-graze at
  small ``t`` darkens more than the same graze far away).

Everything is a pure componentwise function on coordinate arrays (the
plane-native layout of :mod:`ray_marching_tpu.render.fast`); the modular
AoS pipeline calls the same core on unstacked components, so the two
renderers agree to roundoff by construction.  Differentiable end-to-end:
the running minima use where-select semantics (:func:`utils.vmin`) so
cotangents route to the arg-min sample only.

Both modes dispatch by *name* (``mode="shaded"``) rather than extending the
integer mode list: the reference's ``mode % 8`` wraparound
(shader.py:204-209) is golden-parity-pinned for integer modes, so the
extras live outside the integer space.
"""

from __future__ import annotations

import math

from ray_marching_tpu.utils import clamp, vmin

#: Shader modes beyond the reference's eight, dispatched by name.
EXTRA_MODES = ("occlusion", "shaded")

#: Initial offset along the shadow ray (escapes the |f| ~ 0 shell at the
#: hit point before the penumbra estimate starts dividing by t).
SHADOW_T0 = 0.02
#: Per-step march-distance clamp for the shadow ray: the minimum guarantees
#: progress past the surface shell, the maximum bounds the traced range to
#: steps * SHADOW_STEP_MAX.
SHADOW_STEP_MAX = 0.5
#: Geometric weight decay of successive AO probes (farther probes matter
#: less).
AO_FALLOFF = 0.7


def normalized_light(light_direction):
    """Unit light direction (pointing from surface toward the light) as a
    tuple of python floats — static under jit."""
    lx, ly, lz = (float(v) for v in light_direction)
    norm = math.sqrt(lx * lx + ly * ly + lz * lz)
    if norm == 0.0:
        raise ValueError("light_direction must be nonzero")
    return lx / norm, ly / norm, lz / norm


def ambient_occlusion(sdf_c, params, p, n, *, samples: int = 5,
                      step: float = 0.05, strength: float = 1.0,
                      falloff: float = AO_FALLOFF):
    """SDF ambient occlusion at surface points ``p`` with normals ``n``.

    Probes the field at ``p + i*step*n`` for ``i = 1..samples``; on open
    ground ``f == i*step`` exactly (occlusion 0), while nearby geometry
    pulls ``f`` below the probe height.  Returns
    ``clamp(1 - strength * sum_i w_i (h_i - f_i)/h_i / sum_i w_i, 0, 1)``
    with geometric weights ``w_i = falloff**(i-1)``.

    Args:
        sdf_c: componentwise scene SDF ``(params, x, y, z) -> d``.
        p, n: component triples (x, y, z) / (nx, ny, nz) of equal-shaped
            arrays (planes or image grids).
    Returns:
        occlusion factor array shaped like ``p[0]``, in [0, 1]
        (1 = fully open).
    """
    px, py, pz = p
    nx, ny, nz = n
    occ = None
    weight = 1.0
    total = 0.0
    for i in range(1, samples + 1):
        h = i * step
        d = sdf_c(params, px + h * nx, py + h * ny, pz + h * nz)
        term = (weight / h) * (h - d)
        occ = term if occ is None else occ + term
        total += weight
        weight *= falloff
    return clamp(1.0 - (strength / total) * occ, 0.0, 1.0)


def soft_shadow(sdf_c, params, p, n, light_direction, *, steps: int = 16,
                sharpness: float = 16.0, t0: float = SHADOW_T0,
                step_max: float = SHADOW_STEP_MAX, surface_eps: float = 5e-2):
    """Soft shadow factor at surface points ``p``: sphere-trace toward the
    light and keep the penumbra estimate ``min_t sharpness * f(t) / t``.

    The shadow ray starts at ``p + surface_eps * n`` (off the surface shell)
    and advances by ``clamp(f, t0, step_max)`` each step, so it always makes
    progress and the traced range is bounded by ``steps * step_max``.

    Returns:
        shadow factor array shaped like ``p[0]``, in [0, 1]
        (1 = fully lit, 0 = hard shadow).
    """
    lx, ly, lz = normalized_light(light_direction)
    px, py, pz = p
    nx, ny, nz = n
    ox = px + surface_eps * nx
    oy = py + surface_eps * ny
    oz = pz + surface_eps * nz
    res = None
    t = t0
    for _ in range(steps):
        d = sdf_c(params, ox + t * lx, oy + t * ly, oz + t * lz)
        est = sharpness * d / t
        res = est if res is None else vmin(res, est)
        t = t + clamp(d, t0, step_max)
    return clamp(res, 0.0, 1.0)


def shaded_intensity(sdf_c, params, p, n, config):
    """Directional-light intensity: ``ao * (ambient + (1-ambient) *
    max(0, <n, l>) * shadow)``, all terms from the config knobs."""
    lx, ly, lz = normalized_light(config.light_direction)
    nx, ny, nz = n
    diffuse = clamp(nx * lx + ny * ly + nz * lz, 0.0, 1.0)
    ao = ambient_occlusion(
        sdf_c, params, p, n,
        samples=config.ao_samples, step=config.ao_step,
        strength=config.ao_strength,
    )
    shadow = soft_shadow(
        sdf_c, params, p, n, config.light_direction,
        steps=config.shadow_steps, sharpness=config.shadow_sharpness,
        surface_eps=config.normals_eps,
    )
    amb = float(config.ambient)
    return clamp(ao * (amb + (1.0 - amb) * diffuse * shadow), 0.0, 1.0)


def shade_extra(name: str, sdf_c, params, p, n, config):
    """Dispatch one named extra mode → single intensity channel.

    Shared by both renderers (the fast path passes its hit planes, the
    modular path unstacked AoS components) so they agree to roundoff."""
    if name == "occlusion":
        return ambient_occlusion(
            sdf_c, params, p, n,
            samples=config.ao_samples, step=config.ao_step,
            strength=config.ao_strength,
        )
    if name == "shaded":
        return shaded_intensity(sdf_c, params, p, n, config)
    raise ValueError(f"unknown extra shader mode: {name!r}")
