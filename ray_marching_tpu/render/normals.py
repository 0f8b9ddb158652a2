"""Surface normals and Laplacians from tetrahedral finite differences.

Replicates the reference SDFNormals estimator (reference:
rendering/ray_marching.py:87-125): four SDF samples at scaled tetrahedral
offsets give the gradient via a precomputed 3×3 inverse; the Laplacian comes
from the same four samples plus one centre evaluation:
``(f(p) − mean(f(p + εvᵢ))) · 6/ε²``.

Constants are computed in float64 numpy at setup and cast to the requested
dtype. An exact autodiff alternative (``jax.grad`` of the SDF) is provided —
the reference README notes autograd normals as the more accurate variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Tetrahedral vertex directions (reference: rendering/ray_marching.py:96-105).
_TETRA = np.asarray(
    [
        [1.0, 0.0, -np.sqrt(0.5)],
        [-1.0, 0.0, -np.sqrt(0.5)],
        [0.0, 1.0, np.sqrt(0.5)],
        [0.0, -1.0, np.sqrt(0.5)],
    ],
    dtype=np.float64,
)


def make_offsets(normals_eps: float, np_dtype=np.float64):
    """Scaled unit tetrahedral offsets (4, 3) and the inverse of the
    relative-offset matrix (3, 3), both as numpy in ``np_dtype``."""
    unit = _TETRA / np.linalg.norm(_TETRA, axis=-1, keepdims=True)
    offsets = (unit * normals_eps).astype(np_dtype)
    relative = offsets[1:4] - offsets[0:1]
    inverse = np.linalg.inv(relative.astype(np.float64)).astype(np_dtype)
    return offsets, inverse


class NormalsEstimator:
    """Holds the offset constants; :meth:`__call__` is pure."""

    def __init__(self, normals_eps: float = 5e-2, dtype=jnp.float32):
        self.normals_eps = normals_eps
        offsets, inverse = make_offsets(normals_eps)
        self.offsets = jnp.asarray(offsets, dtype=dtype)
        self.offsets_inverse = jnp.asarray(inverse, dtype=dtype)

    def __call__(self, sdf_vec, params, surface_coords):
        """Tetrahedral normals + Laplacian at ``surface_coords`` (..., 3).

        Returns ``(normals (..., 3), laplacian (..., 1))``.
        """
        # One batched eval over the 4 offsets: (..., 4, 3) -> (..., 4, 1).
        offset_values = sdf_vec(params, surface_coords[..., None, :] + self.offsets)
        d_values = offset_values[..., 1:4, :] - offset_values[..., 0:1, :]
        # normals_i = sum_j inverse[i, j] * d_j  (3x3 solve via broadcast).
        normals = jnp.sum(self.offsets_inverse * d_values[..., None, :, 0], axis=-1)
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        centre = sdf_vec(params, surface_coords)
        laplacian = (centre - jnp.mean(offset_values, axis=-2)) * (
            6.0 / self.normals_eps**2
        )
        return normals, laplacian


def autodiff_normals(sdf_vec, params, surface_coords):
    """Exact normals via ``jax.grad`` of the SDF, normalized.

    The differentiate-the-SDF alternative the reference README points at;
    costs one extra VJP instead of 4 extra evals.
    """

    def scalar_sdf(p):
        return sdf_vec(params, p)[..., 0].sum()

    grads = jax.grad(scalar_sdf)(surface_coords)
    return grads / jnp.linalg.norm(grads, axis=-1, keepdims=True)
