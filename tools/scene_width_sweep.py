"""Wide-scene stress sweep: N-leaf unions through the fused mega-kernel.

The fuzzer nests DEEP (tests/test_scene_fuzz.py, depth 5); this sweeps
WIDE — hard unions of 8/32/64/128(/256) transformed spheres — where the
flat params vector, the per-child coordinate-plane registers, and Mosaic
compile time all scale with leaf count (SURVEY.md hard part 5: "scene
compiler generality"). Measures, per width, on the real TPU:

  * Mosaic compile time of the fused forward (and optionally the fused
    backward) mega-kernel;
  * steady-state forward ms/frame (pipelined-fetch timing per CLAUDE.md);
  * train (value_and_grad) ms when --train is passed.

Failures are caught and recorded as rows (the sweep's job is to FIND the
limit, not to die at it). Output: one JSON line per width.

Usage:
    python tools/scene_width_sweep.py [--widths 8 32 64 128] [--px 512]
        [--steps 16] [--train] [--march-impl fused]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_wide_scene(n: int, seed: int = 0):
    """A hard union of ``n`` rigidly-transformed spheres scattered over a
    shell around the origin (every leaf learnable, like the registry
    scenes — reference scene/scene_registry.py:54-79 pattern, widened)."""
    import numpy as np

    from ray_marching_tpu.scene.graph import Affine, Sphere, Union

    rng = np.random.default_rng(seed)
    children = []
    for _ in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        pos = rng.uniform(-2.0, 2.0, size=3)
        children.append(
            Affine(
                child=Sphere(radius=float(rng.uniform(0.15, 0.5))),
                orientation=tuple(float(v) for v in q),
                translation=tuple(float(v) for v in pos),
            )
        )
    return Union(children=tuple(children))


def time_pipelined(fn, args, iters):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    fetch = lambda o: float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    fetch(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="*",
                    default=[8, 32, 64, 128])
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--march-impl", default="fused",
                    choices=["fused", "xla"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ray_marching_tpu import runtime
    from ray_marching_tpu.render.fast import FastRenderer
    from ray_marching_tpu.render.pipeline import RenderConfig

    runtime.enable_persistent_cache()
    px = 3.45e-6
    w = h = args.px
    cfg = RenderConfig(
        px_width=w, px_height=h, focal_length=px * h,
        sensor_width=px * w, sensor_height=px * h,
        marching_steps=args.steps,
    )
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32)
    n_rays = w * h

    for n in args.widths:
        row = {"leaves": n, "px": args.px, "steps": args.steps,
               "march_impl": args.march_impl}
        try:
            r = FastRenderer(build_wide_scene(n), cfg,
                             march_impl=args.march_impl)
            row["n_params"] = int(
                sum(x.size for x in
                    jax.tree_util.tree_leaves(r.init_params))
            )
            fwd = r.jitted(mode=0, degree=1)
            t0 = time.time()
            dt = time_pipelined(fwd, (r.init_params, q, t), args.iters)
            row["compile_fwd_s"] = round(time.time() - t0 - dt * args.iters, 1)
            row["fwd_ms"] = round(dt * 1e3, 3)
            row["fwd_mrays_per_s"] = round(n_rays / dt / 1e6, 1)
        except Exception as exc:
            row["fwd_error"] = str(exc).splitlines()[0][:160]
        if args.train and "fwd_error" not in row:
            try:
                def loss(p):
                    img = r.render(p, q, t, mode=0, degree=1)
                    return jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0)))

                step = jax.jit(jax.value_and_grad(loss))
                t0 = time.time()
                dt = time_pipelined(step, (r.init_params,), args.iters)
                row["compile_bwd_s"] = round(
                    time.time() - t0 - dt * args.iters, 1
                )
                row["train_ms"] = round(dt * 1e3, 3)
            except Exception as exc:
                row["train_error"] = str(exc).splitlines()[0][:160]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
