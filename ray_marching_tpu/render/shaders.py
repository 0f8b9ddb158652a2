"""The eight-shader stack + cyclic-colourmap domain colouring.

Pure-function re-implementations of the reference shader modules
(reference: rendering/shader.py), formula-exact including the quirks golden
parity depends on:

* the ``1e-2`` distance clamps and ``1/2.33`` gamma exponents;
* **global** (whole-tensor) min/max normalizations in the distance,
  proximity and laplacian shaders (shader.py:34-37,51-54,83-84) — under a
  sharded render these become cross-device reductions: pass ``axis_names``
  when calling from inside ``shard_map``, or let jit+sharding insert the
  collectives automatically;
* the spin shader passes ``(im, re)`` into domain colouring's
  ``(real, imag)`` slots (shader.py:171) — replicated as-is for parity;
* the 4096-row cyclic colourmap gather with ``floor → int → mod``.

The ``shade_all`` dispatcher renders all eight modes at once — the working
version of the reference's dead/buggy OmniShader (shader.py:266-346, whose
3-arg distance call would TypeError; the capability is kept, the bug is not).
"""

from __future__ import annotations

import math
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ray_marching_tpu import quat
from ray_marching_tpu.utils import clamp, prmax, prmin, rmax, rmin

_GAMMA = 1.0 / 2.33
_CMAP_PATH = Path(__file__).resolve().parent.parent / "data" / "cyclic_cmap.npy"

MODES = (
    "lambertian",
    "distance",
    "proximity",
    "vignette",
    "normal",
    "laplacian",
    "tangent",
    "spin",
)


def load_cyclic_cmap(dtype=jnp.float32) -> jnp.ndarray:
    """The (4096, 3) cyclic colourmap (converted from the reference's
    data/cyclic_cmap.pt, loaded at shader.py:177)."""
    return jnp.asarray(np.load(_CMAP_PATH), dtype=dtype)


def _global_reduce(x, reduce_fn, sharded_fn, axis_names):
    """Whole-tensor reduction, extended across mesh axes when named.

    The sharded variant fuses the local reduce with the collective
    (utils.prmin/prmax) so the reduction stays differentiable — bare
    ``lax.pmin``/``pmax`` have no VJP rule — with the exact global
    tie-splitting semantics of the single-device path."""
    if axis_names:
        return sharded_fn(x, tuple(axis_names))
    return reduce_fn(x)


def lambertian(ray_directions, surface_normals):
    """``clamp(−⟨v, N⟩, 0, 1)`` (shader.py:12-20) → 1 channel."""
    return clamp(
        -jnp.sum(ray_directions * surface_normals, axis=-1, keepdims=True), 0.0, 1.0
    )


def distance(px_coords, surface_coords, axis_names=()):
    """Log travel distance, globally min-max normalized, gamma-corrected
    (shader.py:23-38) → 1 channel."""
    log_dists = jnp.log(
        clamp(
            jnp.linalg.norm(px_coords - surface_coords, axis=-1, keepdims=True),
            1e-2,
        )
    )
    lo = _global_reduce(log_dists, rmin, prmin, axis_names)
    hi = _global_reduce(log_dists, rmax, prmax, axis_names)
    return ((log_dists - lo) / (hi - lo)) ** _GAMMA


def proximity(surface_distances, axis_names=()):
    """Same normalization on terminal SDF values (shader.py:41-55) → 1ch."""
    log_dists = jnp.log(clamp(surface_distances, 1e-2))
    lo = _global_reduce(log_dists, rmin, prmin, axis_names)
    hi = _global_reduce(log_dists, rmax, prmax, axis_names)
    return ((log_dists - lo) / (hi - lo)) ** _GAMMA


def vignette(ray_directions, pixel_frames):
    """``⟨v, R·e_z⟩³`` — cosine-to-optical-axis falloff (shader.py:58-66).

    ``pixel_frames`` is (N, 3, 3); its third column is the world-space
    optical axis. The reference's broadcast is only well-formed for
    num_cameras == 1; this implements the per-camera semantics (identical
    output at N == 1).
    """
    axis = pixel_frames[:, None, None, :, 2]
    return jnp.sum(ray_directions * axis, axis=-1, keepdims=True) ** 3


def normal(surface_normals):
    """RGB = |N| clamped (shader.py:69-74) → 3 channels."""
    return clamp(jnp.abs(surface_normals), 0.0, 1.0)


def laplacian(surface_laplacian, axis_names=()):
    """Laplacian mapped ``(1 − L/max|L|)/2``, clamped, gamma-corrected
    (shader.py:77-89) → 1 channel."""
    hi = _global_reduce(jnp.abs(surface_laplacian), rmax, prmax, axis_names)
    x = surface_laplacian / hi
    return clamp((1.0 - x) / 2.0, 0.0, 1.0) ** _GAMMA


def angle_colouring(real_part, imag_part, cyclic_cmap, degree):
    """Hue from complex argument: gather a cyclic-colourmap row by
    ``floor((atan2(im, re)/τ + 0.5)·degree·K) mod K`` (shader.py:92-104)."""
    k = cyclic_cmap.shape[0]
    idx = jnp.floor(
        (jnp.arctan2(imag_part, real_part) / math.tau + 0.5) * degree * k
    ).astype(jnp.int32)
    return cyclic_cmap[jnp.remainder(idx, k), :]


def domain_colouring(real_part, imag_part, cyclic_cmap, degree):
    """Angle colouring scaled by modulus brightness (shader.py:107-118)."""
    colours = angle_colouring(real_part, imag_part, cyclic_cmap, degree)
    brightness = jnp.sqrt(real_part**2 + imag_part**2)[..., None]
    return brightness * colours


# -- gather-free colourmap (Fourier evaluation) -----------------------------
#
# The (4096, 3) table gather dominates tangent/spin frame time on TPU
# (gathers don't vectorize onto the VPU the way elementwise math does).
# The reference map is band-limited: an 8-harmonic Fourier fit matches it
# to 0.02/255 max error — far below the table's own 1/4096-turn angular
# quantization — so evaluating the series is visually exact, runs as ~60
# fused multiply-adds (no gather, and no atan2: the angle enters only
# through cos/sin, recovered from re/im by normalization and de Moivre),
# and is differentiable in the angle where the gather is
# piecewise-constant. Opt-in (RenderConfig.cmap_fourier) because golden
# parity pins the exact floor→gather semantics.

FOURIER_HARMONICS = 8


def fourier_cmap_coeffs(cmap=None, harmonics: int = FOURIER_HARMONICS):
    """Least-squares Fourier fit of a cyclic colourmap.

    Returns (1 + 2·harmonics, 3) numpy float64 coefficients ordered
    [dc, cos 1θ, sin 1θ, cos 2θ, sin 2θ, …], with table row ``i`` placed at
    bin-centre angle ``(i + 0.5)·2π/K`` (matching the gather's floor-to-bin
    indexing at half-bin offset)."""
    cm = np.asarray(
        np.load(_CMAP_PATH) if cmap is None else cmap, np.float64
    )
    k = cm.shape[0]
    theta = (np.arange(k) + 0.5) * (2.0 * np.pi / k)
    cols = [np.ones(k)]
    for h in range(1, harmonics + 1):
        cols += [np.cos(h * theta), np.sin(h * theta)]
    coef, *_ = np.linalg.lstsq(np.stack(cols, axis=1), cm, rcond=None)
    return coef


def angle_colouring_fourier(real_part, imag_part, coeffs, degree):
    """Gather-free :func:`angle_colouring`: evaluate the Fourier fit at the
    continuous angle ``degree·(atan2(im, re) + π)`` (the table's fractional
    index times its bin width). No transcendentals at all — ``cos/sin`` of
    the base angle come from normalizing (re, im), the degree multiple and
    the harmonics from angle-addition recurrences.

    Returns a tuple of 3 channel arrays shaped like ``real_part``.
    """
    r = jnp.sqrt(real_part * real_part + imag_part * imag_part)
    pos = r > 0
    safe = jnp.where(pos, r, jnp.ones_like(r))
    # Base angle a+π (the index formula's +0.5 turn): cos = −re/r, sin = −im/r.
    # r == 0 matches the gather path's atan2(0, 0) = 0 → angle π.
    c0 = jnp.where(pos, -real_part / safe, -jnp.ones_like(r))
    s0 = jnp.where(pos, -imag_part / safe, jnp.zeros_like(r))
    # de Moivre: angle × degree (static python int).
    cd, sd = jnp.ones_like(c0), jnp.zeros_like(s0)
    for _ in range(abs(int(degree))):
        cd, sd = cd * c0 - sd * s0, cd * s0 + sd * c0
    if degree < 0:
        sd = -sd
    dtype = real_part.dtype
    harmonics = (coeffs.shape[0] - 1) // 2
    out = [jnp.full_like(real_part, float(coeffs[0, j])) for j in range(3)]
    ch, sh = cd, sd
    for h in range(1, harmonics + 1):
        for j in range(3):
            out[j] = (
                out[j]
                + jnp.asarray(coeffs[2 * h - 1, j], dtype) * ch
                + jnp.asarray(coeffs[2 * h, j], dtype) * sh
            )
        if h < harmonics:
            ch, sh = ch * cd - sh * sd, ch * sd + sh * cd
    return tuple(out)


def domain_colouring_fourier(real_part, imag_part, coeffs, degree):
    """Gather-free :func:`domain_colouring` (brightness × Fourier hue)."""
    cols = angle_colouring_fourier(real_part, imag_part, coeffs, degree)
    brightness = jnp.sqrt(real_part**2 + imag_part**2)
    return jnp.stack([brightness * c for c in cols], axis=-1)


def tangent(camera_orientation_conj, ray_directions, surface_normals,
            cyclic_cmap, degree=1, cmap_coeffs=None):
    """Screen-space tangent field: project N onto the sensor plane, rotate
    into the camera frame with q̄, domain-colour (T_x, T_y)
    (shader.py:121-150) → 3 channels."""
    projected = quat.rotation(
        surface_normals
        - jnp.sum(surface_normals * ray_directions, axis=-1, keepdims=True)
        * ray_directions,
        camera_orientation_conj,
    )
    if cmap_coeffs is not None:
        return domain_colouring_fourier(
            projected[..., 0], projected[..., 1], cmap_coeffs, degree
        )
    return domain_colouring(
        projected[..., 0], projected[..., 1], cyclic_cmap, degree
    )


def spin(camera_orientation_conj, surface_normals, cyclic_cmap, degree=1,
         cmap_coeffs=None):
    """S³→S¹ fibration colouring of ``q̄·(0, N)`` (shader.py:153-171).

    Note the reference feeds ``(im, re)`` into domain colouring's
    ``(real, imag)`` slots — replicated verbatim for pixel parity.
    """
    zeros = jnp.zeros(surface_normals.shape[:-1] + (1,), surface_normals.dtype)
    value = quat.multiply(
        jnp.concatenate([zeros, surface_normals], axis=-1),
        camera_orientation_conj,
    )
    a, bcd = value[..., 0], value[..., 1:]
    real_part = a**2 - jnp.sum(bcd**2, axis=-1)
    imag_part = jnp.linalg.norm(bcd, axis=-1) * a * 2.0
    if cmap_coeffs is not None:
        return domain_colouring_fourier(imag_part, real_part, cmap_coeffs, degree)
    return domain_colouring(imag_part, real_part, cyclic_cmap, degree)


def shade(
    mode: int,
    *,
    px_coords,
    camera_orientation,
    pixel_frames,
    ray_directions,
    surface_coords,
    surface_normals,
    surface_laplacian,
    surface_distances,
    cyclic_cmap,
    degree: int = 1,
    axis_names=(),
    cmap_coeffs=None,
):
    """Dispatch one of the eight shaders by (static) mode index.

    Mirrors the reference Shader dispatcher's ordered mode list and
    ``mode % 8`` wraparound (shader.py:204-209). Returns (N, H, W, 1 or 3).
    ``cmap_coeffs`` switches tangent/spin to the gather-free Fourier
    colourmap evaluation."""
    name = MODES[mode % len(MODES)]
    if name == "lambertian":
        return lambertian(ray_directions, surface_normals)
    if name == "distance":
        return distance(px_coords, surface_coords, axis_names)
    if name == "proximity":
        return proximity(surface_distances, axis_names)
    if name == "vignette":
        return vignette(ray_directions, pixel_frames)
    if name == "normal":
        return normal(surface_normals)
    if name == "laplacian":
        return laplacian(surface_laplacian, axis_names)
    conj = quat.conjugate(camera_orientation)[:, None, None, :]
    if name == "tangent":
        return tangent(conj, ray_directions, surface_normals, cyclic_cmap,
                       degree, cmap_coeffs)
    return spin(conj, surface_normals, cyclic_cmap, degree, cmap_coeffs)


def shade_all(**kwargs):
    """Render every shader mode at once; returns ``{mode_name: image}``.

    The working replacement for the reference's dead OmniShader capability
    (shader.py:266-346).
    """
    return {name: shade(i, **kwargs) for i, name in enumerate(MODES)}
