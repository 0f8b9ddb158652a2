"""Measure-before-building probe: row-vector-native neural march vs the
plane-layout forms (ROADMAP "neural kernel perf" item).

The fused Pallas mega-kernel evaluates NeuralSDF(impl='matmul') by
collapsing each (rows, 128) coordinate plane to a (1, rows*128) lane
vector per evaluation (scene/neural.py:neural_sdf_matmul). The suspected
residual overhead at width 64 (2.4 Tflop/s vs 9.6 at width 256,
docs/PERFORMANCE.md) is those per-eval Mosaic relayouts. Before building
a row-vector-native march layout into the kernel, bound the possible win
by timing, pure-XLA on the real chip:

  a) ideal        — march state held as (3, N) ray-major blocks end to
                    end; the MLP is a bare matmul chain, zero reshapes.
                    This is the speed-of-light for a row-native layout.
  b) plane-xla    — march state as (rows, 128) planes, evaluator =
                    neural_sdf_matmul with its per-eval collapse
                    reshapes, but run by XLA (which fuses contiguous
                    reshapes) instead of Mosaic.
  c) (reference point, not re-run here: fused Pallas kernel = 19.7 ms at
     width 64, 512^2, 16 steps — docs/PERFORMANCE.md width sweep; its
     Mosaic compile is ~20 min, so we compare against the recorded
     number.)

Both probes do the mega-kernel's evaluation count: `steps` march evals +
1 terminal + 4 normal-offset evals (the offsets batched 4-wide like
render/normals.py), no shading epilogue (lambertian shading is ~0.1 ms
at this size). Timing per CLAUDE.md: pipelined dispatches, completion
forced by a host fetch.

Usage:
    python tools/neural_rowmajor_probe.py [--px 512] [--steps 16]
        [--widths 16 64 256] [--iters 50]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--widths", type=int, nargs="*", default=[16, 64, 256])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (trace/sanity only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_marching_tpu import runtime

    runtime.enable_persistent_cache()  # repeat probes skip tunnel compiles

    from ray_marching_tpu.scene.neural import (NeuralSDF, init_neural_params,
                                               neural_sdf_matmul)

    n = args.px * args.px
    rows = n // 128
    key = jax.random.PRNGKey(0)
    # Synthetic but realistic rays: unit directions, origins on a shell.
    kp, kv = jax.random.split(key)
    p0 = jax.random.normal(kp, (3, n), jnp.float32)
    p0 = p0 / jnp.linalg.norm(p0, axis=0, keepdims=True) * 2.0
    v = -p0 / jnp.linalg.norm(p0, axis=0, keepdims=True)
    v = v + 0.05 * jax.random.normal(kv, (3, n), jnp.float32)
    v = v / jnp.linalg.norm(v, axis=0, keepdims=True)

    # 4 tetrahedral offset directions, columns of (3, 4) — only the eval
    # COUNT and shapes matter for the probe (render/normals.py geometry).
    eps = 5e-2
    r = 0.70710678
    offs = jnp.asarray(
        [[1.0, -1.0, 0.0, 0.0],
         [0.0, 0.0, 1.0, -1.0],
         [-r, r, r, r]], jnp.float32)
    offs = offs / jnp.linalg.norm(offs, axis=0, keepdims=True) * eps

    for width in args.widths:
        node = NeuralSDF(hidden=(width, width), seed=3, impl="matmul")
        params = init_neural_params(node)
        n_layers = len(node.hidden) + 1
        act = jnp.sin

        def mlp_rowmajor(params, h3):
            # Bare matmul chain on a (3, N) block — zero reshapes.
            h = h3
            for layer in range(n_layers):
                w = params[f"w{layer}"]
                b = params[f"b{layer}"]
                scale = node.w0 if layer == 0 else 1.0
                h = jnp.dot(w.T, h, preferred_element_type=jnp.float32)
                h = h + b.reshape(-1, 1)
                if layer < n_layers - 1:
                    h = act(h * scale)
            base = jnp.sqrt(jnp.sum(h3 * h3, axis=0)) - params["radius"]
            return base + h[0]  # (N,)

        def march_rowmajor(params, p, v):
            for _ in range(args.steps):
                d = mlp_rowmajor(params, p)
                p = p + d[None, :] * v
            # terminal + 4 normal-offset evals, batched as one (3, 5N)
            # eval — a row-native kernel is free to batch its epilogue.
            po = jnp.concatenate(
                [p] + [p + offs[:, i:i + 1] for i in range(4)],
                axis=1)  # (3, 5N)
            d_all = mlp_rowmajor(params, po)
            # Depend on ALL five segments: XLA's slice-through-dot
            # simplification would otherwise narrow the epilogue matmul
            # chain to the used columns and undercount the epilogue work
            # this probe is meant to bound.
            return d_all[:n] + d_all[n:].reshape(4, n).sum(0)

        evaluate = neural_sdf_matmul(node)

        def march_planes(params, px_, py_, pz_, vx, vy, vz):
            x, y, z = px_, py_, pz_
            for _ in range(args.steps):
                d = evaluate(params, x, y, z)
                x = x + d * vx
                y = y + d * vy
                z = z + d * vz
            d_term = evaluate(params, x, y, z)
            d_off = 0.0
            for i in range(4):
                d_off = d_off + evaluate(
                    params, x + offs[0, i], y + offs[1, i], z + offs[2, i])
            return d_term + d_off

        xp = [c.reshape(rows, 128) for c in p0]
        vp = [c.reshape(rows, 128) for c in v]

        row = {"width": width, "px": args.px, "steps": args.steps,
               "fused_kernel_ms_recorded":
               {16: 5.66, 64: 19.7, 256: 76.0}.get(width)}
        f_row = jax.jit(march_rowmajor)
        t0 = time.time()
        dt = time_pipelined(f_row, (params, p0, v), args.iters)
        row["rowmajor_compile_s"] = round(time.time() - t0 - dt * args.iters, 1)
        row["rowmajor_ms"] = round(dt * 1e3, 3)
        f_pl = jax.jit(march_planes)
        t0 = time.time()
        dt = time_pipelined(f_pl, (params, *xp, *vp), args.iters)
        row["planes_xla_compile_s"] = round(time.time() - t0 - dt * args.iters, 1)
        row["planes_xla_ms"] = round(dt * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
