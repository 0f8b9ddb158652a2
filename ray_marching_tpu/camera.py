"""Pinhole camera: ray-grid construction and world-space posing.

Replicates the reference PinholeCamera semantics (reference:
rendering/ray_marching.py:9-64) as pure functions over precomputed constants:

* the sensor plane sits at z = 0; the focus at ``(0, 0, -focal_length)``;
* pixel positions use pixel-center sampling, i.e. the affine_grid
  ``align_corners=False`` convention: NDC coordinate ``(2i + 1)/W - 1``
  scaled by ``±sensor/2`` (x by ``+sw/2``, y by ``-sh/2``);
* ray directions are ``normalize(position - focus)`` (eps-free), so rays
  exit through the pixels away from the focus;
* posing rotates positions/directions by the camera quaternion, translates
  positions, and reports the camera rotation matrix (the reference's
  ``pixel_frames`` return, rendering/ray_marching.py:63-64).

``grid_dtype`` controls the dtype the constants are *computed* in before the
cast to the render dtype; the reference always builds them in float32
(``self.theta.float()``, rendering/ray_marching.py:42) regardless of module
dtype, so float32 is the parity default while float64 gives exact math for
golden tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ray_marching_tpu import quat


@dataclass(frozen=True)
class CameraConfig:
    num_cameras: int = 1
    px_width: int = 800
    px_height: int = 800
    focal_length: float = 17e-3
    sensor_width: float = 17e-3
    sensor_height: float = 17e-3

    @staticmethod
    def from_pixel_pitch(px_width: int, px_height: int, px_size: float = 3.45e-6,
                         num_cameras: int = 1) -> "CameraConfig":
        """The reference app's parameterization: focal length = sensor height
        (vertical FoV ≈ 53.13°), sensor sized by pixel pitch (main.py:23-26,39-41)."""
        return CameraConfig(
            num_cameras=num_cameras,
            px_width=px_width,
            px_height=px_height,
            focal_length=px_size * px_height,
            sensor_width=px_size * px_width,
            sensor_height=px_size * px_height,
        )


def _pixel_center_grid(cfg: CameraConfig, grid_dtype,
                       row_range: Tuple[int, int] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Sensor-plane pixel positions and unit ray directions, shape (H, W, 3).

    Computed in numpy at setup time (host constants, like the reference's
    registered buffers). ``row_range=(r0, r1)`` generates only those pixel
    rows of the full-image grid (same NDC math over the full height) — the
    tiled renderer builds strips this way without materializing giant
    grids; rows past the image height extrapolate the same formula (the
    caller masks/crops them)."""
    w, h = cfg.px_width, cfg.px_height
    xs = (2.0 * np.arange(w, dtype=grid_dtype) + 1.0) / w - 1.0
    rows = (
        np.arange(h, dtype=grid_dtype)
        if row_range is None
        else np.arange(row_range[0], row_range[1], dtype=grid_dtype)
    )
    ys = (2.0 * rows + 1.0) / h - 1.0
    px = np.asarray(cfg.sensor_width / 2.0, dtype=grid_dtype) * xs
    py = np.asarray(-cfg.sensor_height / 2.0, dtype=grid_dtype) * ys
    positions = np.zeros((len(ys), w, 3), dtype=grid_dtype)
    positions[:, :, 0] = px[None, :]
    positions[:, :, 1] = py[:, None]
    focus = np.asarray([0.0, 0.0, -cfg.focal_length], dtype=grid_dtype)
    rel = positions - focus
    directions = rel / np.linalg.norm(rel, axis=-1, keepdims=True)
    return positions, directions


class Camera:
    """Holds the ray-grid constants; :meth:`pose` is the pure forward map."""

    def __init__(self, cfg: CameraConfig, dtype=jnp.float32, grid_dtype=np.float32):
        self.cfg = cfg
        positions, directions = _pixel_center_grid(cfg, grid_dtype)
        n = cfg.num_cameras
        self.ray_positions = jnp.broadcast_to(
            jnp.asarray(positions, dtype=dtype), (n,) + positions.shape
        )
        self.ray_directions = jnp.broadcast_to(
            jnp.asarray(directions, dtype=dtype), (n,) + directions.shape
        )

    def pose(self, orientation: jnp.ndarray, translation: jnp.ndarray):
        """World-space rays for camera pose(s).

        Args:
            orientation: (N, 4) unit quaternions.
            translation: (N, 3) camera positions.

        Returns:
            ``(pixel_positions, pixel_frames, ray_positions, ray_directions)``
            with positions/directions of shape (N, H, W, 3) and frames of
            shape (N, 3, 3). As in the reference, ``pixel_positions`` and
            ``ray_positions`` are the same array (rendering/ray_marching.py:64).
        """
        q = orientation[:, None, None, :]
        ray_positions = quat.rotation(self.ray_positions, q) + translation[:, None, None, :]
        ray_directions = quat.rotation(self.ray_directions, q)
        pixel_frames = quat.to_so3(orientation)
        return ray_positions, pixel_frames, ray_positions, ray_directions
