"""Plane-native (structure-of-arrays) fast renderer.

The modular pipeline (:mod:`ray_marching_tpu.render.pipeline`) keeps rays
as ``(N, H, W, 3)`` arrays — semantically faithful to the reference, but a
last-dim-3 layout is hostile to TPU tiling (lane dim should be 128). This
renderer keeps **everything** in SoA coordinate planes of shape
``(rows, 128)`` from ray generation to shading:

  camera planes → fused Pallas mega-kernel (march + terminal distance +
  tetrahedral normals + Laplacian, all VMEM-resident;
  :mod:`ray_marching_tpu.ops.pallas_render`) → componentwise shaders →
  one final reshape to (N, H, W, 3).

No AoS↔SoA conversion ever touches the hot loop. Pixel semantics are
identical to the modular path (same formulas, same reference quirks);
parity is tested in tests/test_fast.py. Differentiable end-to-end via the
mega-kernel's custom VJP.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from ray_marching_tpu.ops.pallas_march import split_params_padded

from ray_marching_tpu import quat
from ray_marching_tpu.camera import CameraConfig, _pixel_center_grid
from ray_marching_tpu.ops.pallas_render import (
    fused_march_normals,
    fused_march_normals_cov,
    fused_march_normals_cov_ift,
    fused_march_normals_ift,
)
from ray_marching_tpu.ops.xla_render import (
    xla_march_normals,
    xla_march_normals_cov,
    xla_march_normals_cov_ift,
    xla_march_normals_ift,
)
from ray_marching_tpu.render import lighting, shaders
from ray_marching_tpu.render.pipeline import RenderConfig
from ray_marching_tpu.scene.graph import Node, compile_scene
from ray_marching_tpu.utils import clamp, prmax, prmin, rmax, rmin

LANES = 128
ROWS_PER_TILE = 256


#: 'auto' routes matmul scenes this wide (max hidden width) to the FUSED
#: kernel instead of XLA. On-chip head-to-head (512², 16 steps, f32;
#: docs/PERFORMANCE.md "XLA vs fused march", round 4): XLA wins every
#: forward by 1.5–6% and compiles 4–25× faster, but the fused backward
#: wins wide TRAINING — w64 48.6 vs 64.3 ms (−24%), w256 172.6 vs
#: 261.4 ms (−34%) — while w16 training also goes to XLA (17.1 vs
#: 18.6 ms). Wide nets exist here to be FIT, so 'auto' optimizes the
#: train step above a 2–5% forward edge; forward-only wide serving
#: should pass march_impl='xla' (or serve an exported .rmx).
NEURAL_MARCH_FUSED_MIN_WIDTH = 64
#: With CHEAP activations (sine_fast/softplus/tanh) the transcendental no
#: longer pads XLA's schedule and XLA training stays ahead longer —
#: sine_fast round-5 sweep: train w64 16.1 (xla) vs 19.1 (fused), w128
#: 38.3 vs 21.6, w256 85.7 vs 48.6 — so the fused switch moves to 128
#: when no matmul NeuralSDF uses the exact-jnp 'sine' activation.
NEURAL_MARCH_FUSED_MIN_WIDTH_CHEAP_ACT = 128


def scene_has_exact_sine(node) -> bool:
    """True when any matmul-resolving NeuralSDF uses activation='sine'
    (the slow jnp.sin lowering — the 'auto' dispatch threshold family)."""
    from ray_marching_tpu.scene.neural import NeuralSDF, resolve_impl

    if (isinstance(node, NeuralSDF) and resolve_impl(node) == "matmul"
            and node.activation == "sine"):
        return True
    child = getattr(node, "child", None)
    if child is not None and scene_has_exact_sine(child):
        return True
    return any(
        scene_has_exact_sine(c) for c in getattr(node, "children", ())
    )


def scene_contains_matmul_neural(node) -> bool:
    """True when the scene CONTAINS a NeuralSDF that resolves to the
    matmul evaluator (the ``march_impl='auto'`` dispatch predicate —
    width decides xla vs fused, see NEURAL_MARCH_FUSED_MIN_WIDTH).

    Containment, not dominance: one matmul NeuralSDF anywhere in the tree
    decides the whole march under ``march_impl='auto'``. A mixed scene
    dominated by analytic SDFs may prefer ``march_impl='fused'`` — pass
    it explicitly; a cost-based heuristic is future work."""
    from ray_marching_tpu.scene.neural import NeuralSDF, resolve_impl

    if isinstance(node, NeuralSDF) and resolve_impl(node) == "matmul":
        return True
    child = getattr(node, "child", None)
    if child is not None and scene_contains_matmul_neural(child):
        return True
    return any(
        scene_contains_matmul_neural(c) for c in getattr(node, "children", ())
    )


def max_matmul_neural_width(node) -> int:
    """Widest hidden layer among the scene's matmul-resolving NeuralSDF
    nodes (0 when there are none)."""
    from ray_marching_tpu.scene.neural import NeuralSDF, resolve_impl

    width = 0
    if isinstance(node, NeuralSDF) and resolve_impl(node) == "matmul":
        width = max(node.hidden, default=0)
    child = getattr(node, "child", None)
    if child is not None:
        width = max(width, max_matmul_neural_width(child))
    for c in getattr(node, "children", ()):
        width = max(width, max_matmul_neural_width(c))
    return width


def _to_planes(flat: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows, LANES), flat.dtype)
    out.reshape(-1)[: flat.shape[0]] = flat
    return out


def bake_ray_planes(positions, directions, rows, dtype):
    """(H, W, 3) host grids → two triples of (rows, 128) jnp planes."""
    return tuple(
        tuple(
            jnp.asarray(_to_planes(a[..., i].reshape(-1), rows), dtype)
            for i in range(3)
        )
        for a in (positions, directions)
    )


def pose_plane_group(q, t, pos0, dir0):
    """World-pose one camera's baked planes: rotate by the (1, 4) unit
    quaternion row, translate positions by the (1, 3) row. Shared by the
    plain, sharded, and tiled paths. Returns (origin, dirs) triples."""
    qw, qx, qy, qz = (q[0, i] for i in range(4))
    px, py, pz = quat.rotate_c(qw, qx, qy, qz, *pos0)
    origin = (px + t[0, 0], py + t[0, 1], pz + t[0, 2])
    return origin, quat.rotate_c(qw, qx, qy, qz, *dir0)


class FastRenderer:
    """Drop-in fast forward/backward renderer.

    Multi-camera batches stack each camera's ray grid along the plane rows;
    the fused kernel runs once over all cameras, and the global min/max
    shader normalizations span the whole batch (reference semantics).
    """

    def __init__(self, scene: Node, config: RenderConfig, dtype=jnp.float32,
                 grid_dtype=np.float32, interpret: Optional[bool] = None,
                 row_multiple: Optional[int] = None,
                 march_impl: str = "auto"):
        if interpret is None:
            # Mosaic kernels only compile for TPU; interpret elsewhere.
            interpret = jax.default_backend() == "cpu"
        if march_impl not in ("auto", "fused", "xla"):
            raise ValueError(f"march_impl must be auto|fused|xla, "
                             f"got {march_impl!r}")
        if march_impl == "auto":
            # Matmul (neural) scenes: XLA march below
            # NEURAL_MARCH_FUSED_MIN_WIDTH (wins forward AND train there,
            # compiles in seconds); at/above it the fused Pallas backward
            # wins training by 24–34%, so wide nets stay on the fused
            # kernel. Analytic scenes always take the fused mega-kernel.
            # Every number behind this dispatch: docs/PERFORMANCE.md
            # "XLA vs fused march" (round 4).
            if scene_contains_matmul_neural(scene):
                threshold = (
                    NEURAL_MARCH_FUSED_MIN_WIDTH
                    if scene_has_exact_sine(scene)
                    else NEURAL_MARCH_FUSED_MIN_WIDTH_CHEAP_ACT
                )
                wide = max_matmul_neural_width(scene) >= threshold
                march_impl = "fused" if wide else "xla"
            else:
                march_impl = "fused"
        self.march_impl = march_impl
        self.config = config
        self.dtype = dtype
        self.interpret = interpret
        self.scene = scene
        self.sdf_vec, self.sdf_c, self.init_params = compile_scene(scene, dtype)
        # Kernel-body-only SDF with union bounding-sphere short-circuiting
        # (scene/graph.py compile_node(prune=True)): a per-tile 0/1-trip
        # while skips whole CSG subtrees when the tile is provably beyond
        # them. OPT-IN (RM_TPU_CSG_PRUNE=1): measured NEGATIVE at 1080p on
        # v5e — the Mosaic conditional overhead exceeds the skipped work;
        # see the note above graph._prune_enabled. Forward-only and
        # kernel-body-only by contract (never under shard_map XLA).
        from ray_marching_tpu.scene.graph import _prune_enabled, compile_node

        self.sdf_c_kernel = (
            compile_node(scene, prune=True) if _prune_enabled()
            else self.sdf_c  # default: same closure, no second compile
        )
        self.cyclic_cmap = shaders.load_cyclic_cmap(dtype)
        self.cmap_coeffs = (
            shaders.fourier_cmap_coeffs() if config.cmap_fourier else None
        )

        h, w = config.px_height, config.px_width
        self.num_cameras = config.num_cameras
        self.total = h * w  # rays per camera
        tile = ROWS_PER_TILE if self.total >= ROWS_PER_TILE * LANES else 8
        # row_multiple: extra row-count divisibility (sharded rendering needs
        # rows % (8 · mesh size) == 0 so every device gets whole 8-row
        # sublane tiles).
        if row_multiple:
            tile = max(tile, row_multiple) if tile % row_multiple == 0 \
                else tile * row_multiple // math.gcd(tile, row_multiple)
        self.rows_per_cam = -(-self.total // (LANES * tile)) * tile
        self.rows = self.rows_per_cam * self.num_cameras

        positions, directions = _pixel_center_grid(config.camera_config, grid_dtype)
        self._pos0, self._dir0 = bake_ray_planes(
            positions, directions, self.rows_per_cam, dtype
        )
        valid = np.zeros((self.rows_per_cam * LANES,), np.float32)
        valid[: self.total] = 1.0
        valid = valid.reshape(self.rows_per_cam, LANES)
        self._valid = jnp.asarray(
            np.concatenate([valid] * self.num_cameras, axis=0), dtype
        )
        self._valid_b = self._valid > 0.5

    # -- pure pieces -------------------------------------------------------

    def _pose_planes(self, orientation, translation):
        """World-space position/direction planes, cameras stacked row-wise.
        (The sharded path poses its row shard itself — one camera per
        shard, recovered from the mesh position; parallel/fast_sharding.)"""
        pos0 = self._pos0
        dir0 = self._dir0
        pos, dirs = [], []
        for n in range(self.num_cameras):
            qw, qx, qy, qz = (orientation[n, i] for i in range(4))
            tx, ty, tz = (translation[n, i] for i in range(3))
            px, py, pz = quat.rotate_c(qw, qx, qy, qz, *pos0)
            pos.append((px + tx, py + ty, pz + tz))
            dirs.append(quat.rotate_c(qw, qx, qy, qz, *dir0))
        cat = lambda blocks: jnp.concatenate(blocks, axis=0)
        if self.num_cameras == 1:
            return pos[0], dirs[0]
        return (
            tuple(cat([p[i] for p in pos]) for i in range(3)),
            tuple(cat([d[i] for d in dirs]) for i in range(3)),
        )

    def _per_camera(self, fn, *plane_groups, cameras=None):
        """Apply fn(cam_idx, *per-camera plane slices) and re-concat rows.

        ``cameras`` overrides the camera count (the sharded path shades one
        shard at a time — a single camera's rows, whichever camera that
        shard belongs to)."""
        cameras = self.num_cameras if cameras is None else cameras
        if cameras == 1:
            return fn(0, *plane_groups)
        outs = []
        for n in range(cameras):
            lo = n * self.rows_per_cam
            hi = lo + self.rows_per_cam
            sliced = [
                [p[lo:hi] for p in group] if isinstance(group, (list, tuple))
                else group[lo:hi]
                for group in plane_groups
            ]
            outs.append(fn(n, *sliced))
        return [jnp.concatenate([o[c] for o in outs], axis=0) for c in range(3)]

    def _masked_min(self, v, valid_b=None, axis_names=()):
        """Global masked min; ``axis_names`` extends it across mesh axes
        (for use inside ``shard_map``, matching the reference's whole-image
        reductions, shader.py:34-37,51-54,83-84)."""
        valid_b = self._valid_b if valid_b is None else valid_b
        big = jnp.asarray(np.finfo(np.float32).max, v.dtype)
        # rmin/rmax: select-backward reductions (torch Tensor.min semantics)
        # so a NaN cotangent at the arg-extremum stays there instead of
        # spreading to every plane slot (utils.rmin). The sharded variant
        # fuses the collective into the reduction (utils.prmin — bare
        # lax.pmin has no VJP rule) with the same global tie splitting.
        filled = jnp.where(valid_b, v, big)
        if axis_names:
            return prmin(filled, tuple(axis_names))
        return rmin(filled)

    def _masked_max(self, v, valid_b=None, axis_names=()):
        valid_b = self._valid_b if valid_b is None else valid_b
        big = jnp.asarray(np.finfo(np.float32).max, v.dtype)
        filled = jnp.where(valid_b, v, -big)
        if axis_names:
            return prmax(filled, tuple(axis_names))
        return rmax(filled)

    def _log_minmax_norm(self, dists, valid_b=None, axis_names=(),
                         bounds=None):
        log_d = jnp.log(clamp(dists, 1e-2))
        if bounds is not None:  # precomputed whole-image bounds (tiled)
            lo, hi = bounds
        else:
            lo = self._masked_min(log_d, valid_b, axis_names)
            hi = self._masked_max(log_d, valid_b, axis_names)
        return ((log_d - lo) / (hi - lo)) ** (1.0 / 2.33)

    def norm_bounds(self, mode, origin, hit, valid_b=None, axis_names=()):
        """(lo, hi) of ``mode``'s whole-image normalization statistic over
        this renderer's rays — pass 1 of two-pass tiled rendering, where
        the reference's whole-image min/max (shader.py:34-37,51-54,83-84)
        must span ALL strips before any strip can shade. Same formulas as
        the corresponding `_shade` branches; pinned by the tiled-vs-full
        parity tests. Modes without a global normalization return (0, 1)
        dummies. ``axis_names`` extends the reduction across mesh axes
        (sharded strips — parallel/fast_sharding + tiled mesh mode)."""
        x, y, z, d = hit[0], hit[1], hit[2], hit[3]
        lap = hit[7]
        name = mode if isinstance(mode, str) \
            else shaders.MODES[mode % len(shaders.MODES)]
        if name == "distance":
            ox, oy, oz = origin
            dist = jnp.sqrt((ox - x) ** 2 + (oy - y) ** 2 + (oz - z) ** 2)
            raw = jnp.log(clamp(dist, 1e-2))
        elif name == "proximity":
            raw = jnp.log(clamp(d, 1e-2))
        elif name == "laplacian":
            raw = jnp.abs(lap)
        else:
            zero = jnp.zeros((), x.dtype)
            return zero, zero + 1.0
        return (
            self._masked_min(raw, valid_b, axis_names),
            self._masked_max(raw, valid_b, axis_names),
        )

    def _angle_colouring(self, real, imag, degree):
        if self.cmap_coeffs is not None:  # gather-free Fourier evaluation
            return list(
                shaders.angle_colouring_fourier(
                    real, imag, self.cmap_coeffs, degree
                )
            )
        k = self.cyclic_cmap.shape[0]
        idx = jnp.floor(
            (jnp.arctan2(imag, real) / math.tau + 0.5) * degree * k
        ).astype(jnp.int32)
        idx = jnp.remainder(idx, k)
        rows = self.cyclic_cmap[idx]  # one (rows, 128, 3) gather
        return [rows[..., c] for c in range(3)]

    def _domain_colouring(self, real, imag, degree):
        cols = self._angle_colouring(real, imag, degree)
        brightness = jnp.sqrt(real * real + imag * imag)
        return [brightness * c for c in cols]

    def _shade(self, mode, degree, orientation, origin, dirs, hit,
               valid_b=None, axis_names=(), cameras=None, norm_bounds=None,
               params=None):
        """Componentwise shaders on planes; returns [r, g, b] planes.

        ``valid_b``/``axis_names`` override the global-normalization mask
        for sharded row shards (inside ``shard_map``); ``cameras``
        overrides the camera count (a shard is always one camera — pass 1
        with that camera's ``orientation`` row). ``norm_bounds`` replaces
        the in-batch global min/max with precomputed whole-image bounds
        (:meth:`norm_bounds` — tiled rendering's pass 2). ``params`` is
        only needed by the extra lighting modes (they re-query the SDF)."""
        x, y, z, d, nx, ny, nz, lap = hit
        dx, dy, dz = dirs
        name = mode if isinstance(mode, str) \
            else shaders.MODES[mode % len(shaders.MODES)]
        if name in lighting.EXTRA_MODES:
            if params is None:
                raise ValueError(
                    f"mode {name!r} needs scene params (extra SDF queries)"
                )
            v = lighting.shade_extra(
                name, self.sdf_c, params, (x, y, z), (nx, ny, nz),
                self.config,
            )
            return [v, v, v]
        if name == "lambertian":
            v = clamp(-(dx * nx + dy * ny + dz * nz), 0.0, 1.0)
            return [v, v, v]
        if name == "distance":
            ox, oy, oz = origin
            dist = jnp.sqrt((ox - x) ** 2 + (oy - y) ** 2 + (oz - z) ** 2)
            v = self._log_minmax_norm(dist, valid_b, axis_names, norm_bounds)
            return [v, v, v]
        if name == "proximity":
            v = self._log_minmax_norm(d, valid_b, axis_names, norm_bounds)
            return [v, v, v]
        if name == "vignette":
            def vignette_cam(n, dirs_n):
                dxn, dyn, dzn = dirs_n
                w_, i_, j_, k_ = (orientation[n, c] for c in range(4))
                ax = 2 * (w_ * j_ + i_ * k_)
                ay = 2 * (j_ * k_ - w_ * i_)
                az = w_ * w_ - i_ * i_ - j_ * j_ + k_ * k_
                v = (dxn * ax + dyn * ay + dzn * az) ** 3
                return [v, v, v]
            return self._per_camera(vignette_cam, [dx, dy, dz],
                                    cameras=cameras)
        if name == "normal":
            return [clamp(jnp.abs(c), 0.0, 1.0) for c in (nx, ny, nz)]
        if name == "laplacian":
            hi = (
                norm_bounds[1]
                if norm_bounds is not None
                else self._masked_max(jnp.abs(lap), valid_b, axis_names)
            )
            v = clamp((1.0 - lap / hi) / 2.0, 0.0, 1.0) ** (1.0 / 2.33)
            return [v, v, v]
        if name == "tangent":
            def tangent_cam(n, dirs_n, normals_n):
                dxn, dyn, dzn = dirs_n
                nxn, nyn, nzn = normals_n
                qc = [orientation[n, 0], -orientation[n, 1],
                      -orientation[n, 2], -orientation[n, 3]]
                ndotv = nxn * dxn + nyn * dyn + nzn * dzn
                tx_, ty_, tz_ = (
                    nxn - ndotv * dxn, nyn - ndotv * dyn, nzn - ndotv * dzn
                )
                prx, pry, _ = quat.rotate_c(*qc, tx_, ty_, tz_)
                return self._domain_colouring(prx, pry, degree)
            return self._per_camera(tangent_cam, [dx, dy, dz],
                                    [nx, ny, nz], cameras=cameras)

        # spin: q̄·(0, N); reference passes (im, re) into the (re, im) slots.
        def spin_cam(n, normals_n):
            nxn, nyn, nzn = normals_n
            qc = [orientation[n, 0], -orientation[n, 1],
                  -orientation[n, 2], -orientation[n, 3]]
            zero = jnp.zeros_like(nxn)
            a, bx, by, bz = quat.multiply_c(zero, nxn, nyn, nzn, *qc)
            b2 = bx * bx + by * by + bz * bz
            real_part = a * a - b2
            imag_part = jnp.sqrt(b2) * a * 2.0
            return self._domain_colouring(imag_part, real_part, degree)
        return self._per_camera(spin_cam, [nx, ny, nz], cameras=cameras)

    # -- public API --------------------------------------------------------

    def _march_planes(self, params, origin, dirs, steps, valid=None,
                      with_closest=False):
        """Fused march (+ optional reflection bounces, reference mirror
        formula control.py:179-194); returns the 8 hit planes and the final
        (possibly reflected) direction planes. ``valid`` overrides the
        baked-in validity plane (sharded row shards). ``with_closest``
        additionally returns the along-ray closest-approach plane ``min_f``
        (primary visibility only — incompatible with reflection bounces)."""
        cfg = self.config
        valid = self._valid if valid is None else valid
        flat_params, mats, rebuild = split_params_padded(params, self.dtype)
        if self.march_impl == "xla":
            # Matmul-dominated scenes: XLA-native march (same plane
            # contract, MXU-tiled by XLA, remat backward; ops/xla_render).
            plain, cov = xla_march_normals, xla_march_normals_cov
            ift, cov_ift = xla_march_normals_ift, xla_march_normals_cov_ift
        else:
            plain, cov = fused_march_normals, fused_march_normals_cov
            ift, cov_ift = fused_march_normals_ift, fused_march_normals_cov_ift
        if with_closest and cfg.backward == "implicit":
            # IFT endpoint + argmin-frozen min_f (O(1) backward, same
            # approximation as the modular march_with_closest_implicit).
            def march(*args):
                return cov_ift(
                    *args, cfg.ift_hit_threshold, cfg.ift_denom_eps
                )
        elif with_closest:
            # Exact coverage semantics (modular render_with_alpha parity):
            # autodiff of the minimum chain via the fused backward kernel.
            march = cov
        elif cfg.backward == "implicit":
            # custom_vjp takes positional args only.
            def march(*args):
                return ift(
                    *args, cfg.ift_hit_threshold, cfg.ift_denom_eps
                )
        else:
            march = plain

        # Fused paths take a (plain, forward-only-pruned) SDF pair: the
        # pruned compile traces ONLY into the non-differentiated forward
        # kernels; every autodiff consumer (fused backward kernel, IFT
        # jnp math) uses the plain member (ops/pallas_render._split_sdf;
        # the pruned form's while-conditional has no autodiff rule). The
        # XLA paths run the SDF under possibly-sharded XLA and keep the
        # plain form outright (scene/graph.py hazard note).
        sdf_for_march = (
            (self.sdf_c, self.sdf_c_kernel)
            if self.march_impl != "xla"
            else self.sdf_c
        )

        def run(origin, dirs):
            rays7 = jnp.stack(list(origin) + list(dirs) + [valid], axis=0)
            out = march(
                sdf_for_march, rebuild, flat_params, mats, rays7, steps,
                cfg.tau, cfg.normals_eps, self.interpret,
            )
            return [out[i] for i in range(out.shape[0])]

        hit = run(origin, dirs)
        if with_closest:
            assert cfg.reflection_bounces == 0
            minf = hit[8]
            return hit[:8], dirs, minf
        dx, dy, dz = dirs
        eps = jnp.asarray(cfg.normals_eps, self.dtype)
        for _ in range(cfg.reflection_bounces):
            x, y, z, _, nx, ny, nz, _ = hit
            proj = nx * (-dx) + ny * (-dy) + nz * (-dz)
            dx, dy, dz = 2 * proj * nx + dx, 2 * proj * ny + dy, 2 * proj * nz + dz
            # Escape the |f| ≈ 0 shell before re-marching.
            hit = run((x + dx * eps, y + dy * eps, z + dz * eps), (dx, dy, dz))
        return hit, (dx, dy, dz)

    def render(self, params, orientation, translation, *, mode: int = 0,
               degree: int = 1, marching_steps: Optional[int] = None):
        """Render one frame → (1, H, W, 3)."""
        cfg = self.config
        steps = cfg.marching_steps if marching_steps is None else marching_steps
        origin, dirs = self._pose_planes(orientation, translation)
        hit, final_dirs = self._march_planes(params, origin, dirs, steps)
        channels = self._shade(
            mode, degree, orientation, origin, final_dirs, hit, params=params
        )
        return self._assemble(channels)

    def render_with_alpha(self, params, orientation, translation, *,
                          mode: int = 0, degree: int = 1,
                          marching_steps: Optional[int] = None,
                          beta: Optional[float] = None):
        """Render one frame plus a soft silhouette coverage mask —
        the fused-kernel counterpart of the modular
        ``Renderer.render_with_alpha`` (same ``α = σ(shift − min_f/β)``
        semantics; min_f comes out of the mega-kernel as a 9th plane and
        its gradient is routed to the arg-min march step inside the fused
        backward kernel).

        Returns:
            (image (N, H, W, 3), alpha (N, H, W, 1)).
        """
        from ray_marching_tpu.render.silhouette import soft_coverage

        cfg = self.config
        if cfg.reflection_bounces:
            raise ValueError("render_with_alpha: reflection bounces unsupported")
        steps = cfg.marching_steps if marching_steps is None else marching_steps
        beta = cfg.silhouette_beta if beta is None else beta
        origin, dirs = self._pose_planes(orientation, translation)
        hit, final_dirs, minf = self._march_planes(
            params, origin, dirs, steps, with_closest=True
        )
        channels = self._shade(
            mode, degree, orientation, origin, final_dirs, hit, params=params
        )
        image = self._assemble(channels)
        alpha = self._assemble([soft_coverage(minf, beta)])
        return image, alpha

    def _assemble(self, channels):
        h, w = self.config.px_height, self.config.px_width
        frames = []
        for n in range(self.num_cameras):
            lo = n * self.rows_per_cam
            hi = lo + self.rows_per_cam
            frames.append(
                jnp.stack(
                    [
                        c[lo:hi].reshape(-1)[: self.total].reshape(h, w)
                        for c in channels
                    ],
                    axis=-1,
                )
            )
        return jnp.stack(frames, axis=0)

    def image_to_planes(self, image):
        """Inverse of :meth:`_assemble`: (N, H, W, C) image → (C, rows, 128)
        channel planes (pad slots zero). Used to lay a target image (or a
        target alpha mask, C=1) out like the sharded render's channel
        output for plane-space losses."""
        chans = []
        for c in range(image.shape[-1]):
            blocks = []
            for n in range(self.num_cameras):
                flat = image[n, :, :, c].reshape(-1)
                flat = jnp.pad(
                    flat, (0, self.rows_per_cam * LANES - self.total)
                )
                blocks.append(flat.reshape(self.rows_per_cam, LANES))
            chans.append(jnp.concatenate(blocks, axis=0))
        return jnp.stack(chans, axis=0)

    def render_all_modes(self, params, orientation, translation, *,
                         degree: int = 1, marching_steps: Optional[int] = None,
                         extras: bool = False):
        """All 8 shader modes from ONE fused march+normals pass.

        ``extras=True`` also shades the named lighting modes
        (render/lighting.py) from the same hit planes; the integer mode
        list keeps the reference's mode % 8 contract."""
        cfg = self.config
        steps = cfg.marching_steps if marching_steps is None else marching_steps
        origin, dirs = self._pose_planes(orientation, translation)
        hit, final_dirs = self._march_planes(params, origin, dirs, steps)
        dirs = final_dirs
        modes = list(enumerate(shaders.MODES))
        if extras:
            modes += [(name, name) for name in lighting.EXTRA_MODES]
        images = {}
        for mode, name in modes:
            channels = self._shade(mode, degree, orientation, origin, dirs,
                                   hit, params=params)
            images[name] = self._assemble(channels)
        return images

    def jitted(self, **kwargs):
        return jax.jit(partial(self.render, **kwargs))

    def default_pose(self):
        n = self.num_cameras
        return (
            jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]], self.dtype), (n, 1)),
            jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], self.dtype), (n, 1)),
        )
