"""Camera: pixel-center grid semantics (vs torch affine_grid) and posing."""

import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.camera import Camera, CameraConfig


def make(w=8, h=6, grid_dtype=np.float64, dtype=jnp.float64):
    cfg = CameraConfig.from_pixel_pitch(px_width=w, px_height=h, px_size=3.45e-6)
    return cfg, Camera(cfg, dtype=dtype, grid_dtype=grid_dtype)


def test_grid_matches_torch_affine_grid_convention():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    w, h = 8, 6
    cfg, cam = make(w, h, grid_dtype=np.float32, dtype=jnp.float32)
    theta = torch.tensor(
        [[[cfg.sensor_width / 2, 0.0, 0.0], [0.0, -cfg.sensor_height / 2, 0.0]]]
    )
    grid = F.pad(
        F.affine_grid(theta, size=(1, 1, h, w), align_corners=False),
        pad=[0, 1],
        value=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(cam.ray_positions), grid.numpy(), rtol=1e-6, atol=1e-12
    )
    focus = torch.tensor([0.0, 0.0, -cfg.focal_length])
    dirs = F.normalize(grid - focus, p=2, dim=-1, eps=0.0)
    np.testing.assert_allclose(
        np.asarray(cam.ray_directions), dirs.numpy(), rtol=1e-6, atol=1e-9
    )


def test_directions_are_unit_and_through_pixels():
    cfg, cam = make()
    d = np.asarray(cam.ray_directions)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-12)
    # Central rays point mostly +z (away from the focus at -f).
    assert np.all(d[..., 2] > 0)


def test_identity_pose_is_grid():
    cfg, cam = make()
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    t = jnp.asarray([[0.0, 0.0, 0.0]])
    pp, frames, rp, rd = cam.pose(q, t)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(cam.ray_positions), atol=1e-15)
    np.testing.assert_allclose(np.asarray(rd), np.asarray(cam.ray_directions), atol=1e-15)
    np.testing.assert_allclose(np.asarray(frames), np.eye(3)[None], atol=1e-15)
    assert pp is rp  # same array, as in the reference's 4-tuple return


def test_pose_translates_and_rotates():
    cfg, cam = make()
    s = np.sqrt(0.5)
    q = jnp.asarray([[s, 0.0, s, 0.0]])  # 90° about y: z-axis -> x-axis
    t = jnp.asarray([[1.0, 2.0, 3.0]])
    pp, frames, rp, rd = cam.pose(q, t)
    # Optical axis (third column of frame) maps e_z to e_x.
    np.testing.assert_allclose(np.asarray(frames)[0, :, 2], [1.0, 0.0, 0.0], atol=1e-12)
    # Central ray direction now points +x.
    d = np.asarray(rd)[0, 3, 4]  # near-centre pixel
    assert d[0] > 0.99


def test_fov_from_pixel_pitch():
    # focal length equals sensor height -> vertical half-FoV = atan(1/2).
    cfg, cam = make(w=640, h=480)
    assert cfg.focal_length == pytest.approx(cfg.sensor_height)
    d = np.asarray(cam.ray_directions)
    top_centre = d[0, 0, 320]
    angle = np.arctan2(np.abs(top_centre[1]), top_centre[2])
    assert angle == pytest.approx(np.arctan(0.5), rel=5e-3)
