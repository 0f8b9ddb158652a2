"""Neural-SDF width sweep: componentwise (VPU) vs matmul (MXU) evaluator.

Measures forward and forward+backward rays/s through the fused Pallas
mega-kernel (FastRenderer) on the real TPU at MLP widths 16/64/256, for
both NeuralSDF impls. The numbers land in docs/PERFORMANCE.md; the auto
dispatch threshold (scene/neural.MATMUL_MIN_WIDTH) is set from them.

Timing per CLAUDE.md: pipelined back-to-back dispatches, completion forced
by a host fetch of a jitted scalar (block_until_ready acks early through
the axon tunnel).

Usage:
    python tools/neural_width_sweep.py [--px 512] [--steps 16] [--iters 50]
    python tools/neural_width_sweep.py --cases 16:componentwise 64:matmul

Componentwise width 256 is excluded by default: the evaluator needs
O(width²) traced ops (131k at 256) — Mosaic compilation alone exceeds the
tunnel's compile budget (>10 min), which is precisely the pathology the
matmul evaluator removes. Pass an explicit --cases 256:componentwise to
try anyway.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_CASES = [
    (16, "componentwise"), (16, "matmul"),
    (64, "componentwise"), (64, "matmul"),
    (256, "matmul"),
]


def time_pipelined(fn, args, iters):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    fetch = lambda o: float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    fetch(fn(*args))  # settle
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    fetch(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cases", nargs="*", default=None,
                    help="width:impl pairs, e.g. 64:matmul")
    ap.add_argument("--renderer", default="fast",
                    choices=["fast", "modular"],
                    help="fast = fused Pallas mega-kernel; modular = the "
                         "XLA-scan pipeline (wide-MLP scenes are matmul "
                         "chains XLA fuses natively — see the row-major "
                         "probe, tools/neural_rowmajor_probe.py)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialized backward (modular only; wide "
                         "MLPs cannot store per-step activations)")
    ap.add_argument("--activation", default="sine",
                    help="NeuralSDF activation (sine | sine_fast | "
                         "softplus | tanh)")
    ap.add_argument("--march-impl", default="auto",
                    choices=["auto", "fused", "xla"],
                    help="fast renderer march implementation (auto routes "
                         "matmul scenes to xla)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ray_marching_tpu import runtime

    runtime.enable_persistent_cache()  # repeat sweeps skip tunnel compiles

    from ray_marching_tpu.render.fast import FastRenderer
    from ray_marching_tpu.render.pipeline import RenderConfig, Renderer
    from ray_marching_tpu.scene.neural import NeuralSDF

    cases = (
        [(int(w), i) for w, i in (c.split(":") for c in args.cases)]
        if args.cases else DEFAULT_CASES
    )
    px = 3.45e-6
    w, h = args.px, args.px
    cfg = RenderConfig(
        px_width=w, px_height=h, focal_length=px * h,
        sensor_width=px * w, sensor_height=px * h,
        marching_steps=args.steps, remat=args.remat,
    )
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float32)
    n_rays = w * h

    for width, impl in cases:
        kw = {}
        if impl == "matmul_bf16":
            kw = {"impl": "matmul", "matmul_dtype": "bfloat16"}
        else:
            kw = {"impl": impl}
        node = NeuralSDF(hidden=(width, width), seed=3,
                         activation=args.activation, **kw)
        r = (FastRenderer(node, cfg, march_impl=args.march_impl)
             if args.renderer == "fast" else Renderer(node, cfg))
        row = {"width": width, "impl": impl, "activation": args.activation,
               "px": args.px,
               "steps": args.steps, "renderer": args.renderer,
               "remat": args.remat,
               "march_impl": getattr(r, "march_impl", None)}
        try:
            fwd = r.jitted(mode=0, degree=1)
            t0 = time.time()
            dt = time_pipelined(fwd, (r.init_params, q, t), args.iters)
            row["compile_fwd_s"] = round(time.time() - t0 - dt * args.iters, 1)
            row["fwd_ms"] = round(dt * 1e3, 3)
            row["fwd_rays_per_s"] = round(n_rays / dt)
        except Exception as exc:
            row["fwd_error"] = str(exc).splitlines()[0][:120]
        try:
            def loss(p):
                img = r.render(p, q, t, mode=0, degree=1)
                return jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0)))

            step = jax.jit(jax.value_and_grad(loss))
            t0 = time.time()
            dt = time_pipelined(step, (r.init_params,), args.iters)
            row["compile_bwd_s"] = round(time.time() - t0 - dt * args.iters, 1)
            row["train_ms"] = round(dt * 1e3, 3)
            row["train_rays_per_s"] = round(n_rays / dt)
        except Exception as exc:
            row["train_error"] = str(exc).splitlines()[0][:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
