"""End-to-end differentiable render pipeline.

The TPU-native equivalent of the reference's RenderLoop (reference:
control.py:197-258): one pure function from (scene params, camera pose) to an
(N, H, W, 3) image, compiled as a single XLA computation under ``jax.jit``
(the analogue of the reference's ``torch.compile(render_loop,
'max-autotune')`` boundary, main.py:44).

Pipeline per frame (reference: control.py:231-258):
  camera pose → sphere-trace march → terminal SDF eval → tetrahedral
  normals + Laplacian → one of 8 shaders → broadcast to RGB.

Extensions beyond the reference (all optional, defaults are exact-parity):
early-exit masking (``tau``), rematerialized backward (``remat``),
reflection bounces (``reflection_bounces``, using the reference's mirror
formula control.py:179-194), autodiff normals, and a Pallas fused marcher
(``use_pallas``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.camera import Camera, CameraConfig
from ray_marching_tpu.render import lighting
from ray_marching_tpu.render import march as march_mod
from ray_marching_tpu.render import shaders
from ray_marching_tpu.render.normals import NormalsEstimator, autodiff_normals
from ray_marching_tpu.scene.graph import Node, compile_scene


@dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (hashable; safe as a jit static arg)."""

    num_cameras: int = 1
    px_width: int = 800
    px_height: int = 800
    focal_length: float = 17e-3
    sensor_width: float = 17e-3
    sensor_height: float = 17e-3
    marching_steps: int = 32
    normals_eps: float = 5e-2
    tau: float = 0.0
    remat: bool = False
    backward: str = "unroll"  # 'unroll' (exact parity) | 'implicit' (IFT, fast)
    # IFT backward knobs: rays whose terminal |f| exceeds the hit threshold
    # get zero parameter gradient (no fixed point to differentiate); the
    # v·∇f denominator is clamped away from 0 for grazing rays.
    ift_hit_threshold: float = 0.05
    ift_denom_eps: float = 1e-6
    # Soft-silhouette sharpness for render_with_alpha / silhouette-aware
    # inverse rendering: α = σ(shift − min_f/β) with shift = 4 (see
    # silhouette.soft_coverage — the shift puts hits, min_f → 0⁺, on the
    # saturated side: α ≈ 0.98, not 0.5). Smaller β = sharper mask,
    # narrower gradient band around the silhouette.
    silhouette_beta: float = 5e-2
    reflection_bounces: int = 0
    use_autodiff_normals: bool = False
    use_pallas: bool = False
    # Extra lighting modes beyond the reference's eight, dispatched by NAME
    # (mode="occlusion" / mode="shaded"; render/lighting.py). Integer modes
    # keep the reference's mode % 8 wraparound untouched.
    light_direction: tuple = (0.4, 0.7, 0.6)  # surface → light, normalized at use
    ambient: float = 0.15
    ao_samples: int = 5
    ao_step: float = 0.05
    ao_strength: float = 1.0
    shadow_steps: int = 16
    shadow_sharpness: float = 16.0
    # Gather-free tangent/spin colourmap: evaluate an 8-harmonic Fourier
    # fit of the cyclic map (max err 0.02/255 vs the exact (4096, 3) table
    # gather, which golden parity pins — hence opt-in). Pure VPU math; the
    # win is the removed per-pixel gather on TPU.
    cmap_fourier: bool = False

    @property
    def camera_config(self) -> CameraConfig:
        return CameraConfig(
            num_cameras=self.num_cameras,
            px_width=self.px_width,
            px_height=self.px_height,
            focal_length=self.focal_length,
            sensor_width=self.sensor_width,
            sensor_height=self.sensor_height,
        )


class Renderer:
    """Owns the per-config constants (ray grid, normal offsets, colourmap)
    and exposes pure render functions over them."""

    def __init__(self, scene: Node, config: RenderConfig, dtype=jnp.float32,
                 grid_dtype=np.float32):
        self.config = config
        self.dtype = dtype
        self.scene = scene
        self.sdf_vec, self.sdf_c, self.init_params = compile_scene(scene, dtype)
        self.camera = Camera(config.camera_config, dtype=dtype, grid_dtype=grid_dtype)
        self.normals = NormalsEstimator(config.normals_eps, dtype=dtype)
        self.cyclic_cmap = shaders.load_cyclic_cmap(dtype)
        self.cmap_coeffs = (
            shaders.fourier_cmap_coeffs() if config.cmap_fourier else None
        )

    # -- the pure frame function ------------------------------------------

    def render(self, params, orientation, translation, *, mode: int = 0,
               degree: int = 1, marching_steps: Optional[int] = None,
               axis_names=()):
        """Render one frame.

        Args:
            params: scene parameter pytree (differentiable).
            orientation: (N, 4) camera unit quaternions (differentiable).
            translation: (N, 3) camera positions (differentiable).
            mode: static shader index (0..7, wraps mod 8 — reference
                semantics), or an extra lighting mode by name
                ("occlusion" / "shaded", render/lighting.py).
            degree: winding degree for tangent/spin colouring.
            marching_steps: static step count (defaults to config).
            axis_names: mesh axes to extend the shaders' global min/max
                reductions across, when called inside ``shard_map``.

        Returns:
            (N, H, W, 3) image.
        """
        pixel_pos, pixel_frames, ray_pos, ray_dirs = self.camera.pose(
            orientation, translation
        )
        return self.render_from_rays(
            params, orientation, pixel_pos, pixel_frames, ray_pos, ray_dirs,
            mode=mode, degree=degree, marching_steps=marching_steps,
            axis_names=axis_names,
        )

    def render_from_rays(self, params, orientation, pixel_pos, pixel_frames,
                         ray_pos, ray_dirs, *, mode: int = 0, degree: int = 1,
                         marching_steps: Optional[int] = None,
                         axis_names=()):
        """March → normals → shade from an already-posed ray grid — the
        body shared by :meth:`render` and the sharded path
        (parallel/sharding.py applies its sharding constraints to the
        camera constants, then delegates here), so config flags
        (use_autodiff_normals, cmap_fourier, tau, bounces) cannot drift
        between the two."""
        steps = self.config.marching_steps if marching_steps is None else marching_steps
        surface_coords, ray_dirs = self._march(params, ray_pos, ray_dirs, steps)
        surface_distances = self.sdf_vec(params, surface_coords)
        if self.config.use_autodiff_normals:
            surface_normals = autodiff_normals(self.sdf_vec, params, surface_coords)
            _, surface_laplacian = self.normals(self.sdf_vec, params, surface_coords)
        else:
            surface_normals, surface_laplacian = self.normals(
                self.sdf_vec, params, surface_coords
            )
        if isinstance(mode, str) and mode in lighting.EXTRA_MODES:
            image = lighting.shade_extra(
                mode, self.sdf_c, params,
                tuple(surface_coords[..., i] for i in range(3)),
                tuple(surface_normals[..., i] for i in range(3)),
                self.config,
            )[..., None]
        else:
            image = shaders.shade(
                mode,
                px_coords=pixel_pos,
                camera_orientation=orientation,
                pixel_frames=pixel_frames,
                ray_directions=ray_dirs,
                surface_coords=surface_coords,
                surface_normals=surface_normals,
                surface_laplacian=surface_laplacian,
                surface_distances=surface_distances,
                cyclic_cmap=self.cyclic_cmap,
                cmap_coeffs=self.cmap_coeffs,
                degree=degree,
                axis_names=axis_names,
            )
        h, w = self.config.px_height, self.config.px_width
        return jnp.broadcast_to(image, (image.shape[0], h, w, 3))

    def render_with_alpha(self, params, orientation, translation, *,
                          mode: int = 0, degree: int = 1,
                          marching_steps: Optional[int] = None,
                          beta: Optional[float] = None,
                          axis_names=()):
        """Render one frame plus a **soft silhouette coverage mask**.

        The mask is ``α = σ(shift − min_f/β)`` where ``min_f`` is the
        along-ray closest approach (``march.march_with_closest``): ≈1 for
        rays that hit, ≈0 for clear misses, and *smooth in the scene parameters*
        across the silhouette — the gradient signal that plain pixel losses
        lack (hit/miss is a step function; see render/silhouette.py for the
        stall analysis and tests/test_silhouette.py for the comparison).

        Reflection bounces are not supported on this path (the mask is a
        primary-visibility concept).

        Returns:
            (image (N, H, W, 3), alpha (N, H, W, 1)).
        """
        from ray_marching_tpu.render.silhouette import soft_coverage

        cfg = self.config
        if cfg.reflection_bounces:
            raise ValueError("render_with_alpha: reflection bounces unsupported")
        steps = cfg.marching_steps if marching_steps is None else marching_steps
        beta = cfg.silhouette_beta if beta is None else beta
        pixel_pos, pixel_frames, ray_pos, ray_dirs = self.camera.pose(
            orientation, translation
        )
        if cfg.backward == "implicit":
            # IFT endpoint + argmin-frozen min_f: O(1) backward (see
            # render/implicit.py). Exact autodiff through the scan is the
            # default.
            from ray_marching_tpu.render.implicit import (
                march_with_closest_implicit,
            )

            surface_coords, min_f = march_with_closest_implicit(
                self.sdf_vec, params, ray_pos, ray_dirs, steps, cfg.tau,
                cfg.ift_hit_threshold, cfg.ift_denom_eps,
            )
        else:
            surface_coords, min_f = march_mod.march_with_closest(
                self.sdf_vec, params, ray_pos, ray_dirs, steps,
                tau=cfg.tau, remat=cfg.remat,
            )
        surface_distances = self.sdf_vec(params, surface_coords)
        surface_normals, surface_laplacian = self.normals(
            self.sdf_vec, params, surface_coords
        )
        if isinstance(mode, str) and mode in lighting.EXTRA_MODES:
            image = lighting.shade_extra(
                mode, self.sdf_c, params,
                tuple(surface_coords[..., i] for i in range(3)),
                tuple(surface_normals[..., i] for i in range(3)),
                self.config,
            )[..., None]
        else:
            image = shaders.shade(
                mode,
                px_coords=pixel_pos,
                camera_orientation=orientation,
                pixel_frames=pixel_frames,
                ray_directions=ray_dirs,
                surface_coords=surface_coords,
                surface_normals=surface_normals,
                surface_laplacian=surface_laplacian,
                surface_distances=surface_distances,
                cyclic_cmap=self.cyclic_cmap,
                cmap_coeffs=self.cmap_coeffs,
                degree=degree,
                axis_names=axis_names,
            )
        h, w = cfg.px_height, cfg.px_width
        image = jnp.broadcast_to(image, (image.shape[0], h, w, 3))
        return image, soft_coverage(min_f, beta)

    def render_all_modes(self, params, orientation, translation, *, degree=1,
                         marching_steps=None, axis_names=(), extras=False):
        """Render all 8 shader modes from one march (the OmniShader
        capability, reference shader.py:266-346, minus its bugs).

        ``extras=True`` additionally shades the named lighting modes
        (render/lighting.py) from the same march — the integer mode list
        and its ``mode % 8`` contract stay untouched."""
        steps = self.config.marching_steps if marching_steps is None else marching_steps
        pixel_pos, pixel_frames, ray_pos, ray_dirs = self.camera.pose(
            orientation, translation
        )
        surface_coords, ray_dirs = self._march(params, ray_pos, ray_dirs, steps)
        surface_distances = self.sdf_vec(params, surface_coords)
        surface_normals, surface_laplacian = self.normals(
            self.sdf_vec, params, surface_coords
        )
        images = shaders.shade_all(
            px_coords=pixel_pos,
            camera_orientation=orientation,
            pixel_frames=pixel_frames,
            ray_directions=ray_dirs,
            surface_coords=surface_coords,
            surface_normals=surface_normals,
            surface_laplacian=surface_laplacian,
            surface_distances=surface_distances,
            cyclic_cmap=self.cyclic_cmap,
            cmap_coeffs=self.cmap_coeffs,
            degree=degree,
            axis_names=axis_names,
        )
        if extras:
            for name in lighting.EXTRA_MODES:
                images[name] = lighting.shade_extra(
                    name, self.sdf_c, params,
                    tuple(surface_coords[..., i] for i in range(3)),
                    tuple(surface_normals[..., i] for i in range(3)),
                    self.config,
                )[..., None]
        h, w = self.config.px_height, self.config.px_width
        return {
            k: jnp.broadcast_to(v, (v.shape[0], h, w, 3)) for k, v in images.items()
        }

    # -- internals ---------------------------------------------------------

    def _march(self, params, ray_pos, ray_dirs, steps):
        """March (with optional reflection bounces); returns final positions
        and the (possibly reflected) final ray directions."""
        cfg = self.config
        if cfg.use_pallas:
            from ray_marching_tpu.ops.pallas_march import pallas_march

            marcher = lambda p, v: pallas_march(
                self.sdf_c, params, p, v, steps, tau=cfg.tau
            )
        elif cfg.backward == "implicit":
            from ray_marching_tpu.render.implicit import march_implicit

            marcher = lambda p, v: march_implicit(
                self.sdf_vec, params, p, v, steps, cfg.tau,
                cfg.ift_hit_threshold, cfg.ift_denom_eps,
            )
        else:
            marcher = lambda p, v: march_mod.march(
                self.sdf_vec, params, p, v, steps, tau=cfg.tau, remat=cfg.remat
            )
        p = marcher(ray_pos, ray_dirs)
        v = ray_dirs
        for _ in range(cfg.reflection_bounces):
            n, _ = self.normals(self.sdf_vec, params, p)
            v = march_mod.reflect(v, n)
            # Escape the surface before re-marching so the next march does
            # not stall on the |f| ≈ 0 shell.
            p = p + v * jnp.asarray(cfg.normals_eps, self.dtype)
            p = marcher(p, v)
        return p, v

    # -- convenience -------------------------------------------------------

    def jitted(self, **render_kwargs):
        """A jit-compiled ``f(params, orientation, translation) -> image``."""
        fn = partial(self.render, **render_kwargs)
        return jax.jit(fn)

    def default_pose(self):
        """The reference app's initial pose: camera at (0,0,1), identity
        orientation (main.py:45-49)."""
        n = self.config.num_cameras
        orientation = jnp.tile(
            jnp.asarray([[1.0, 0.0, 0.0, 0.0]], self.dtype), (n, 1)
        )
        translation = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], self.dtype), (n, 1))
        return orientation, translation
