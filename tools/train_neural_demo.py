"""Demo: neural SDF distillation + rendering, with optional pixel-loss
fine-tuning through the differentiable renderer.

Stage 1 (distillation): a SIREN MLP scene node regresses the signed
distance field of an analytic target (smooth two-sphere blend) on random
sample points — converges in seconds.
Stage 2 (optional, --pixel-steps): multi-view pixel-loss fine-tuning
through the sphere-tracing renderer (lambertian + normal shaders). Pure
pixel-loss shape recovery from scratch stalls at silhouettes without
reparameterized gradients (see PAPERS.md) — distill-then-finetune is the
reliable recipe.

Writes target/before/after renders, metrics JSONL, and trained weights.

Usage: python tools/train_neural_demo.py [--steps 3000] [--out docs/neural_fit]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from ray_marching_tpu import runtime

# Persistent compile cache: the multi-view train step is a large program
# and the axon remote-compile path is slow — cache across runs.
runtime.enable_persistent_cache()

import jax.numpy as jnp
import numpy as np
import optax

from ray_marching_tpu.io.image import write_png
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene.graph import (Affine, Box, Onion, SmoothUnion, Sphere, Union)
from ray_marching_tpu.scene.neural import NeuralSDF

PX = 3.45e-6


def make_cfg(w, h, steps=32):
    return RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps, remat=True,
    )


ROOM = Onion(child=Box(halfsides=(5.0, 5.0, 5.0)), radius=0.1)
# A smooth blend of two offset spheres: representable by a small
# Lipschitz-bounded MLP correction on top of the sphere skip (a hard-edged
# target like a box needs steeper corrections than a valid SDF residual
# allows, and sphere tracing then overshoots — silhouette reparameterization
# territory, future work).
TARGET_SHAPE = SmoothUnion(
    children=(
        Affine(child=Sphere(radius=0.45), orientation=(1.0, 0.0, 0.0, 0.0),
               translation=(0.3, 0.1, 0.0)),
        Affine(child=Sphere(radius=0.35), orientation=(1.0, 0.0, 0.0, 0.0),
               translation=(-0.35, -0.1, 0.1)),
    ),
    blend_k=8.0,
)


def poses(n=6, radius=2.2, dtype=jnp.float32):
    """Cameras on a circle in the xz-plane, all looking at the origin."""
    qs, ts = [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        # Yaw about y by (pi + ang): camera at angle ang faces the origin.
        half = (np.pi + ang) / 2
        qs.append([np.cos(half), 0.0, np.sin(half), 0.0])
        ts.append([radius * np.sin(ang), 0.2, radius * np.cos(ang)])
    return jnp.asarray(qs, dtype), jnp.asarray(ts, dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--pixel-steps", type=int, default=200)
    ap.add_argument("--march-steps", type=int, default=24)
    ap.add_argument("--width", type=int, default=80)
    ap.add_argument("--height", type=int, default=60)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default="docs/neural_fit")
    ap.add_argument("--hidden", type=int, default=24,
                    help="MLP hidden width (>=64 exercises the MXU matmul "
                         "evaluator + XLA march)")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "componentwise", "matmul"],
                    help="NeuralSDF evaluator (auto: matmul at width>=64)")
    ap.add_argument("--activation", default="sine",
                    help="NeuralSDF activation (sine | sine_fast | ...)")
    ap.add_argument("--matmul-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="matmul OPERAND precision for the matmul "
                         "evaluator (bfloat16: single-pass MXU dots, f32 "
                         "accumulation — scene/neural.py)")
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    target_scene = Union(children=(ROOM, TARGET_SHAPE))
    learn_scene = Union(
        children=(ROOM, NeuralSDF(hidden=(args.hidden, args.hidden), seed=11,
                                  scale=0.5, w0=8.0, impl=args.impl,
                                  activation=args.activation,
                                  matmul_dtype=args.matmul_dtype))
    )
    # All views render as ONE multi-camera batch: a single pipeline per
    # shader mode in the jit graph keeps compile time sane.
    cfg = make_cfg(args.width, args.height, steps=args.march_steps)
    cfg = RenderConfig(**{**cfg.__dict__, "num_cameras": args.views})
    q, t = poses(args.views)

    target_r = Renderer(target_scene, cfg, dtype=jnp.float32)
    learn_r = Renderer(learn_scene, cfg, dtype=jnp.float32)

    # Normal-shader supervision: per-pixel surface normals give strong
    # interior shape gradients (flat faces vs curved blob), where pure
    # lambertian losses stall at the silhouette (see PAPERS.md on
    # reparameterized silhouette gradients — future work).
    targets = {
        mode: jax.jit(
            lambda p, m=mode: target_r.render(p, q, t, mode=m, degree=1)
        )(target_r.init_params)
        for mode in (0, 4)
    }

    def loss_fn(params):
        total = 0.0
        for mode in (0, 4):
            pred = learn_r.render(params, q, t, mode=mode, degree=1)
            total = total + jnp.mean((pred - targets[mode]) ** 2)
        return total

    optimizer = optax.adam(
        optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.1)
    )
    params = learn_r.init_params
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    big = make_cfg(480, 360, steps=48)
    target_big = Renderer(target_scene, big, dtype=jnp.float32)
    learn_big = Renderer(learn_scene, big, dtype=jnp.float32)
    # Eager renders through the TPU tunnel are pathologically slow — jit.
    big_learn0 = learn_big.jitted(mode=0, degree=1)
    big_learn4 = learn_big.jitted(mode=4, degree=1)
    write_png(out_dir / "target.png",
              target_big.jitted(mode=0, degree=1)(
                  target_big.init_params, q[:1], t[:1]))
    write_png(out_dir / "before.png", big_learn0(params, q[:1], t[:1]))

    # ---- stage 1: SDF distillation on random points ----
    tgt_sdf_vec = target_r.sdf_vec
    lrn_sdf_vec = learn_r.sdf_vec
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (16384, 3)), jnp.float32)
    tgt_params = target_r.init_params
    d_target = tgt_sdf_vec(tgt_params, pts)

    @jax.jit
    def distill_step(params, opt_state):
        def l(p):
            return jnp.mean((lrn_sdf_vec(p, pts) - d_target) ** 2)

        loss, grads = jax.value_and_grad(l)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    metrics = open(out_dir / "metrics.jsonl", "w")
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = distill_step(params, opt_state)
        if i % 100 == 0 or i == args.steps - 1:
            rec = {"stage": "distill", "step": i, "loss": float(loss),
                   "wall_s": time.perf_counter() - t0}
            print(json.dumps(rec), flush=True)
            metrics.write(json.dumps(rec) + "\n")

    write_png(out_dir / "after_distill.png", big_learn0(params, q[:1], t[:1]))

    # ---- stage 2 (optional): pixel-loss fine-tune through the renderer ----
    if args.pixel_steps:
        # Gentle constant lr: full-rate fine-tuning destroys the distilled
        # field (measured round 1).
        fine_opt = optax.adam(args.lr / 30.0)
        opt_state = fine_opt.init(params)

        @jax.jit
        def fine_step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = fine_opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        # rays/s for the train loop: each step renders views x W x H rays
        # through TWO shader modes (fwd+bwd each).
        rays_per_step = 2 * args.views * args.width * args.height
        tp, last_i = time.perf_counter(), -1
        for i in range(args.pixel_steps):
            params, opt_state, loss = fine_step(params, opt_state)
            if i % 20 == 0 or i == args.pixel_steps - 1:
                now = time.perf_counter()
                rec = {"stage": "pixel", "step": i, "loss": float(loss),
                       "wall_s": now - t0,
                       "rays_per_s": round(rays_per_step * (i - last_i)
                                           / max(now - tp, 1e-9))}
                tp, last_i = now, i
                print(json.dumps(rec), flush=True)
                metrics.write(json.dumps(rec) + "\n")
    metrics.close()

    write_png(out_dir / "after.png", big_learn0(params, q[:1], t[:1]))
    write_png(out_dir / "after_normals.png", big_learn4(params, q[:1], t[:1]))
    from ray_marching_tpu.io.checkpoint import save_pytree

    save_pytree(out_dir / "weights.npz", params)
    print(f"wrote renders + weights to {out_dir}")


if __name__ == "__main__":
    main()
