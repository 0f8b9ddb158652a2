"""Tiled (strip) rendering: images larger than one device pass.

Renders arbitrarily large frames by marching horizontal
pixel strips through the fused mega-kernel and assembling on the host —
device memory and compile size are bounded by the strip, not the image
(motivation measured in docs/PERFORMANCE.md: an 8K frame exceeds this
environment's compile-request limit as one pass, and a 16K×16K ray grid
alone would dwarf HBM).

The reference semantics complication is the whole-image min/max
normalization in the distance/proximity/laplacian shaders (reference
rendering/shader.py:34-37,51-54,83-84): a strip cannot normalize by its
own extrema. Those modes run TWO passes — pass 1 marches every strip and
reduces its normalization statistic (`FastRenderer.norm_bounds`), the
host merges the per-strip bounds, pass 2 re-marches and shades with the
merged bounds (`_shade(..., norm_bounds=...)`). Re-marching costs one
extra forward (march ≪ transfer for remote TPUs; hit planes never cross
the host link). Modes without a global normalization shade in one pass.

Forward-only by design: this is the poster/dataset/serving path. For
gradients at large resolutions use the sharded fast path
(parallel/fast_sharding.py) on more chips instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.camera import _pixel_center_grid
from ray_marching_tpu.render import shaders
from ray_marching_tpu.render.fast import (
    LANES,
    FastRenderer,
    bake_ray_planes,
    pose_plane_group,
)
from ray_marching_tpu.render.pipeline import RenderConfig
from ray_marching_tpu.scene.graph import Node

TWO_PASS_MODES = frozenset({"distance", "proximity", "laplacian"})


class TiledRenderer:
    """Strip-at-a-time renderer over the fused-kernel fast path.

    One :class:`FastRenderer` sized to ``(px_width, strip_height)`` does
    all device work; strips differ only in their (host-generated) camera
    plane arguments, so each (mode, degree) traces exactly two jitted
    callables regardless of image size. The last strip's rows past the
    image height extrapolate the pixel grid and are masked out of the
    normalization statistics and cropped from the output.
    """

    def __init__(self, scene: Node, config: RenderConfig, *,
                 strip_height: int = 512, dtype=jnp.float32,
                 grid_dtype=np.float32, interpret: Optional[bool] = None,
                 mesh=None):
        if strip_height < 1:
            raise ValueError(f"strip_height must be >= 1, got {strip_height}")
        self.config = config
        self.num_cameras = config.num_cameras
        self.strip_height = min(strip_height, config.px_height)
        self.grid_dtype = grid_dtype
        # ``mesh``: a jax.sharding.Mesh — every strip's device pass then
        # runs the fused kernel row-sharded over ALL devices (sharded ×
        # tiled composition: wall-size frames use every chip, SURVEY §5
        # "sequence scaling = rendering 4K+ images by tiling across
        # chips"). The per-strip stats/shade collectives are two scalar
        # pmin/pmax — everything else is communication-free per ray.
        self.mesh = mesh
        # The device-side worker is always a 1-camera strip renderer;
        # multi-camera batches loop (camera, strip) pairs on the host with
        # each camera's pose row, and the whole-image normalizations span
        # the full batch (reference semantics) via the merged bounds.
        strip_cfg = dataclasses.replace(
            config, px_height=self.strip_height, num_cameras=1
        )
        self.fast = FastRenderer(
            scene, strip_cfg, dtype=dtype, grid_dtype=grid_dtype,
            interpret=interpret,
            # Row shards must be whole 8-row sublane tiles on every device.
            row_multiple=8 * mesh.devices.size if mesh is not None else None,
        )
        self.dtype = dtype
        self.init_params = self.fast.init_params
        self.num_strips = -(-config.px_height // self.strip_height)
        self._fns = {}  # (mode, degree) -> (stats_fn, shade_fn)

    # -- per-strip host-side constants --------------------------------------

    def _strip_planes(self, s: int):
        cfg = self.config
        fast = self.fast
        r0 = s * self.strip_height
        pos, dirs = _pixel_center_grid(
            cfg.camera_config, self.grid_dtype,
            row_range=(r0, r0 + self.strip_height),
        )
        pos0, dir0 = bake_ray_planes(pos, dirs, fast.rows_per_cam, self.dtype)
        # Extrapolated rows of the last strip are invalid: masked out of
        # the pass-1 statistics and the pad slots of every plane.
        n_real = max(0, min(self.strip_height, cfg.px_height - r0)) * cfg.px_width
        valid = np.zeros((fast.rows_per_cam * LANES,), np.float32)
        valid[:n_real] = 1.0
        valid = jnp.asarray(
            valid.reshape(fast.rows_per_cam, LANES), self.dtype
        )
        return pos0, dir0, valid, min(self.strip_height, cfg.px_height - r0)

    # -- traced per-strip passes ---------------------------------------------

    def _get_fns(self, mode: int, degree: int):
        key = (mode, degree)
        if key in self._fns:
            return self._fns[key]
        fast = self.fast
        steps = self.config.marching_steps
        axes = tuple(self.mesh.axis_names) if self.mesh is not None else ()

        def march(params, q, t, pos0, dir0, valid):
            origin, dirs = pose_plane_group(q, t, pos0, dir0)
            hit, final_dirs = fast._march_planes(
                params, origin, dirs, steps, valid=valid
            )
            return origin, final_dirs, hit

        def stats(params, q, t, pos0, dir0, valid):
            origin, _, hit = march(params, q, t, pos0, dir0, valid)
            return fast.norm_bounds(mode, origin, hit, valid_b=valid > 0.5,
                                    axis_names=axes)

        def shade_channels(params, q, t, pos0, dir0, valid, bounds):
            origin, dirs, hit = march(params, q, t, pos0, dir0, valid)
            channels = fast._shade(
                mode, degree, q, origin, dirs, hit, valid_b=valid > 0.5,
                norm_bounds=bounds, params=params,
            )
            return jnp.stack(channels, axis=0)

        if self.mesh is not None:
            # Sharded × tiled: each strip's device pass runs row-sharded
            # over the whole mesh. The fixed per-strip bounds make shade
            # collective-free; stats needs the two pmin/pmax above
            # (norm_bounds axis_names). Pose cotangents psum through
            # shard_map's transpose like fast_sharding's paths.
            from jax.sharding import PartitionSpec as P

            rep = P()
            plane = P(axes, None)
            stats = jax.shard_map(
                stats, mesh=self.mesh,
                in_specs=(rep, rep, rep, (plane,) * 3, (plane,) * 3, plane),
                out_specs=(rep, rep),
                check_vma=False,
            )
            shade_channels = jax.shard_map(
                shade_channels, mesh=self.mesh,
                in_specs=(rep, rep, rep, (plane,) * 3, (plane,) * 3, plane,
                          (rep, rep)),
                out_specs=P(None, axes, None),
                check_vma=False,
            )

        def shade(params, q, t, pos0, dir0, valid, bounds):
            return fast._assemble(
                shade_channels(params, q, t, pos0, dir0, valid, bounds)
            )

        fns = (jax.jit(stats), jax.jit(shade))
        self._fns[key] = fns
        self._fns[("raw_shade",) + key] = shade
        return fns

    # -- public API ----------------------------------------------------------

    def _cam_rows(self, orientation, translation):
        q = jnp.asarray(orientation, self.dtype)
        t = jnp.asarray(translation, self.dtype)
        return [(q[n: n + 1], t[n: n + 1]) for n in range(self.num_cameras)]

    def _merged_bounds(self, stats_fn, params, poses, np_dtype):
        """Pass 1: per-(camera, strip) statistics, merged on the host with
        np.minimum/maximum (not Python min/max: a NaN statistic must
        poison the bounds exactly like the one-pass renderer's in-image
        reduction would, not be silently dropped). Depth-2 pipelined."""
        los, his = [], []
        pending = None
        for qn, tn in poses:
            for s in range(self.num_strips):
                pos0, dir0, valid, _ = self._strip_planes(s)
                cur = stats_fn(params, qn, tn, pos0, dir0, valid)
                if pending is not None:
                    los.append(float(pending[0]))
                    his.append(float(pending[1]))
                pending = cur
        los.append(float(pending[0]))
        his.append(float(pending[1]))
        return (
            np.asarray(np.minimum.reduce(los), np_dtype),
            np.asarray(np.maximum.reduce(his), np_dtype),
        )

    def render(self, params, orientation, translation, *, mode: int = 0,
               degree: int = 1) -> np.ndarray:
        """Render one frame strip by strip → host ndarray (N, H, W, 3).

        Both passes run a depth-2 pipeline (dispatch strip s+1 before
        fetching strip s — the viewer-loop pattern) so the host bake and
        the device→host fetch hide under the next strip's march while
        device memory stays bounded by two strips. Multi-camera batches
        loop (camera, strip) pairs; the global normalizations span the
        whole batch like the one-pass renderers.
        """
        stats_fn, shade_fn = self._get_fns(mode, degree)
        name = shaders.MODES[mode % len(shaders.MODES)]
        two_pass = name in TWO_PASS_MODES
        poses = self._cam_rows(orientation, translation)
        np_dtype = np.dtype(self.dtype)

        if two_pass:
            bounds = self._merged_bounds(stats_fn, params, poses, np_dtype)
        else:
            # Host scalars: no eager device dispatch for the unused
            # dummies (CLAUDE.md: never run unjitted array code on the
            # TPU tunnel).
            bounds = (np.zeros((), np_dtype), np.ones((), np_dtype))

        frames = [[] for _ in poses]
        pending = None
        for n, (qn, tn) in enumerate(poses):
            for s in range(self.num_strips):
                pos0, dir0, valid, rows_real = self._strip_planes(s)
                img = shade_fn(params, qn, tn, pos0, dir0, valid, bounds)
                if pending is not None:
                    pn, pimg, prows = pending
                    frames[pn].append(np.asarray(pimg)[0, :prows])
                pending = (n, img, rows_real)
        pn, pimg, prows = pending
        frames[pn].append(np.asarray(pimg)[0, :prows])
        return np.stack(
            [np.concatenate(f, axis=0) for f in frames], axis=0
        )

    def jitted(self, **kwargs):
        """CLI-compatibility shim: the strip loop is host-side (each strip
        pass is already jitted internally), so this is a plain partial."""
        import functools

        return functools.partial(self.render, **kwargs)

    def default_pose(self):
        q1, t1 = self.fast.default_pose()  # the worker is single-camera
        n = self.num_cameras
        return jnp.tile(q1, (n, 1)), jnp.tile(t1, (n, 1))

    def render_all_modes(self, params, orientation, translation, *,
                         degree: int = 1, extras: bool = False):
        """All 8 shader modes strip by strip, TWO marches per strip total
        (one stats pass gathering the three normalized modes' bounds
        jointly, one shade pass emitting all 8 images) — the tiled
        counterpart of ``FastRenderer.render_all_modes`` (the reference's
        OmniShader capability) for frames beyond one device pass.
        ``extras=True`` adds the named lighting modes (no global
        normalization — they shade in the same single pass)."""
        from ray_marching_tpu.render import lighting

        mode_list = list(enumerate(shaders.MODES))
        if extras:
            mode_list += [(name, name) for name in lighting.EXTRA_MODES]
        key = ("all", degree, extras)
        if key not in self._fns:
            fast = self.fast
            steps = self.config.marching_steps

            def march(params, q, t, pos0, dir0, valid):
                origin, dirs = pose_plane_group(q, t, pos0, dir0)
                hit, final_dirs = fast._march_planes(
                    params, origin, dirs, steps, valid=valid
                )
                return origin, final_dirs, hit

            def stats_all(params, q, t, pos0, dir0, valid):
                origin, _, hit = march(params, q, t, pos0, dir0, valid)
                vb = valid > 0.5
                return {
                    m: fast.norm_bounds(m, origin, hit, valid_b=vb)
                    for m, name in enumerate(shaders.MODES)
                    if name in TWO_PASS_MODES
                }

            def shade_all(params, q, t, pos0, dir0, valid, bounds):
                origin, dirs, hit = march(params, q, t, pos0, dir0, valid)
                vb = valid > 0.5
                return {
                    name: fast._assemble(
                        fast._shade(
                            m, degree, q, origin, dirs, hit, valid_b=vb,
                            norm_bounds=bounds.get(m) if isinstance(m, int)
                            else None,
                            params=params,
                        )
                    )
                    for m, name in mode_list
                }

            self._fns[key] = (jax.jit(stats_all), jax.jit(shade_all))
        stats_all, shade_all = self._fns[key]

        poses = self._cam_rows(orientation, translation)
        np_dtype = np.dtype(self.dtype)
        per_mode = {}
        for qn, tn in poses:
            for s in range(self.num_strips):
                pos0, dir0, valid, _ = self._strip_planes(s)
                sb = stats_all(params, qn, tn, pos0, dir0, valid)
                for m, (slo, shi) in sb.items():
                    lo, hi = per_mode.get(m, (np.inf, -np.inf))
                    per_mode[m] = (
                        np.minimum(lo, float(slo)),
                        np.maximum(hi, float(shi)),
                    )
        bounds = {
            m: (np.asarray(lo, np_dtype), np.asarray(hi, np_dtype))
            for m, (lo, hi) in per_mode.items()
        }
        frames = [[] for _ in poses]
        for n, (qn, tn) in enumerate(poses):
            for s in range(self.num_strips):
                pos0, dir0, valid, rows_real = self._strip_planes(s)
                imgs = shade_all(params, qn, tn, pos0, dir0, valid, bounds)
                frames[n].append(
                    {k: np.asarray(v)[0, :rows_real] for k, v in imgs.items()}
                )
        return {
            name: np.stack(
                [
                    np.concatenate([st[name] for st in f], axis=0)
                    for f in frames
                ],
                axis=0,
            )
            for _, name in mode_list
        }

    # -- strip-accumulated gradients ------------------------------------------

    def _get_grad_fn(self, mode: int, degree: int, *, with_pose=False,
                     with_alpha=False, loss_fn=None):
        key = ("grad", mode, degree, with_pose, with_alpha,
               None if loss_fn is None else id(loss_fn))
        if key in self._fns:
            return self._fns[key]
        self._get_fns(mode, degree)
        shade = self._fns[("raw_shade", mode, degree)]
        fast = self.fast
        steps = self.config.marching_steps
        n_px = (
            self.num_cameras * self.config.px_height
            * self.config.px_width * 3
        )
        n_apx = (
            self.num_cameras * self.config.px_height * self.config.px_width
        )
        if loss_fn is None:
            # Default per-pixel loss: squared error, render NaNs compare
            # as 0 (optim.inverse semantics).
            loss_fn = lambda img, tgt: jnp.square(
                jnp.nan_to_num(img, nan=0.0) - tgt
            )

        def strip_alpha(params, q, t, pos0, dir0, valid, beta):
            from ray_marching_tpu.render.silhouette import soft_coverage

            origin, dirs = pose_plane_group(q, t, pos0, dir0)
            _, _, minf = fast._march_planes(
                params, origin, dirs, steps, valid=valid, with_closest=True
            )
            return fast._assemble([soft_coverage(minf, beta)])

        def strip_loss(params, q, t, pos0, dir0, valid, bounds, target,
                       alpha_target, beta, alpha_weight):
            img = shade(params, q, t, pos0, dir0, valid, bounds)
            loss = jnp.sum(loss_fn(img[0, : target.shape[0]], target)) / n_px
            if with_alpha:
                # min_f is per-ray, so the soft silhouette needs no
                # cross-strip work — each strip marches once more with the
                # coverage plane and contributes its α rows exactly.
                alpha = strip_alpha(params, q, t, pos0, dir0, valid, beta)
                aerr = jnp.square(
                    alpha[0, : alpha_target.shape[0]] - alpha_target
                )
                loss = loss + alpha_weight * jnp.sum(aerr) / n_apx
            return loss

        argnums = (0, 1, 2) if with_pose else 0
        fn = jax.jit(jax.value_and_grad(strip_loss, argnums=argnums))
        self._fns[key] = fn
        return fn

    def loss_and_grad(self, params, orientation, translation, target, *,
                      mode: int = 0, degree: int = 1, with_pose=False,
                      loss_fn=None, alpha_target=None, alpha_weight=1.0,
                      beta=None):
        """Pixel loss and gradients, accumulated strip by strip — inverse
        rendering at resolutions whose single backward pass (march history
        + planes) would not fit one device pass.

        Args:
            target: (N, H, W, 3) target image. The default per-pixel loss
                is the squared error (NaN render pixels compare as 0, like
                ``optim.inverse``), normalized by the total pixel count so
                the value matches a one-pass whole-image MSE.
            with_pose: also differentiate w.r.t. the camera pose — returns
                ``(loss, (params_grad, orientation_grad, translation_grad))``
                with per-camera pose rows assembled to (N, 4)/(N, 3).
            loss_fn: pluggable per-pixel loss ``f(img_rows, tgt_rows) ->
                per-pixel values`` (summed and normalized by total pixels);
                default squared error.
            alpha_target: optional (N, H, W, 1) silhouette target — adds
                ``alpha_weight · MSE(soft_coverage, alpha_target)`` with
                the fused coverage march per strip (min_f is per-ray, so
                strips compose exactly; ``beta`` defaults to
                config.silhouette_beta).

        Gradients are EXACT (sum of per-strip cotangents) for modes
        without a whole-image normalization; for distance/proximity/
        laplacian the merged bounds are treated as constants, i.e. the
        measure-zero gradient routed through the arg-extremum pixel by
        full autodiff is dropped (the loss value is exact either way —
        and full autodiff's routed gradient is NaN at that pixel anyway:
        x**(1/2.33) has infinite slope at x = 0).
        """
        cfg = self.config
        if alpha_target is not None and cfg.reflection_bounces:
            raise ValueError("alpha_target: reflection bounces unsupported")
        with_alpha = alpha_target is not None
        stats_fn, _ = self._get_fns(mode, degree)
        grad_fn = self._get_grad_fn(
            mode, degree, with_pose=with_pose, with_alpha=with_alpha,
            loss_fn=loss_fn,
        )
        name = shaders.MODES[mode % len(shaders.MODES)]
        poses = self._cam_rows(orientation, translation)
        np_dtype = np.dtype(self.dtype)
        target = np.asarray(target)
        beta = cfg.silhouette_beta if beta is None else beta
        beta = jnp.asarray(beta, self.dtype)
        alpha_weight = jnp.asarray(alpha_weight, self.dtype)

        if name in TWO_PASS_MODES:
            bounds = self._merged_bounds(stats_fn, params, poses, np_dtype)
        else:
            bounds = (np.zeros((), np_dtype), np.ones((), np_dtype))

        loss = 0.0
        grads = None
        pose_grads = []
        dummy_alpha = jnp.zeros((1, 1, 1), self.dtype)
        for n, (qn, tn) in enumerate(poses):
            gq = gt = None
            for s in range(self.num_strips):
                pos0, dir0, valid, rows_real = self._strip_planes(s)
                r0 = s * self.strip_height
                tgt = jnp.asarray(
                    target[n, r0: r0 + rows_real], self.dtype
                )
                atgt = (
                    jnp.asarray(
                        np.asarray(alpha_target)[n, r0: r0 + rows_real],
                        self.dtype,
                    )
                    if with_alpha else dummy_alpha
                )
                sl, sg = grad_fn(
                    params, qn, tn, pos0, dir0, valid, bounds, tgt, atgt,
                    beta, alpha_weight,
                )
                if with_pose:
                    sg, sgq, sgt = sg
                    gq = sgq if gq is None else gq + sgq
                    gt = sgt if gt is None else gt + sgt
                loss = loss + sl
                grads = (
                    sg if grads is None
                    else jax.tree_util.tree_map(jnp.add, grads, sg)
                )
            if with_pose:
                pose_grads.append((gq, gt))
        if with_pose:
            gq = jnp.concatenate([g[0] for g in pose_grads], axis=0)
            gt = jnp.concatenate([g[1] for g in pose_grads], axis=0)
            return loss, (grads, gq, gt)
        return loss, grads
