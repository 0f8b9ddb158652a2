"""Benchmark: forward+backward rays/s on the flagship render.

Backward-mode selection via BENCH_BACKWARD: "remat" (default; exact
gradients, rematerialized scan), "unroll" (exact, plain autodiff),
"implicit" (IFT fixed-point backward; ~5x faster, approximate at
silhouette rays). BENCH_PALLAS=1 routes the march through the fused
Pallas kernel.

Measures value_and_grad of a pixel loss through the full pipeline
(test_scene2, lambertian, 32 march steps, float32) at 1080p on the default
device (TPU when present), and a CPU reference in a subprocess at reduced
resolution (rays/s is per-ray work, so resolution-independent to first
order; the reduction keeps the CPU leg fast).

Prints ONE JSON line:
  {"metric": "rays_per_sec_fwd_bwd_1080p", "value": <tpu rays/s>,
   "unit": "rays/s/chip", "vs_baseline": <tpu / (10 x cpu)>}

vs_baseline >= 1.0 means the BASELINE.md target (>=10x CPU rays/s per chip)
is met; the value itself is the headline rays/s on one chip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_STEPS = 32
WARMUP_ITERS = 2


def build_step(width, height, dtype_name="float32", use_pallas=False):
    import jax
    import jax.numpy as jnp

    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
    from ray_marching_tpu.scene import registry

    dtype = getattr(jnp, dtype_name)
    px = 3.45e-6
    cfg = RenderConfig(
        px_width=width,
        px_height=height,
        focal_length=px * height,
        sensor_width=px * width,
        sensor_height=px * height,
        marching_steps=BENCH_STEPS,
        use_pallas=use_pallas,
        # Rematerialized backward: bitwise-identical gradients to the plain
        # unrolled backward, ~1.5x faster and O(1) residual memory per step.
        remat=os.environ.get("BENCH_BACKWARD", "remat") == "remat",
        backward="implicit"
        if os.environ.get("BENCH_BACKWARD") == "implicit"
        else "unroll",
    )
    fast_ok = (
        os.environ.get("BENCH_FAST", "1") == "1"
        and os.environ.get("BENCH_BACKWARD", "remat") == "remat"
    )
    if fast_ok and not use_pallas:
        from ray_marching_tpu.render.fast import FastRenderer

        r = FastRenderer(registry.make_scene("test_scene2"), cfg, dtype=dtype)
    else:
        r = Renderer(registry.make_scene("test_scene2"), cfg, dtype=dtype)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], dtype)
    t = jnp.asarray([[0.0, 0.2, 2.5]], dtype)
    target = jnp.zeros((1, height, width, 3), dtype)

    def loss_fn(params):
        image = r.render(params, q, t, mode=0, degree=2)
        return jnp.mean((image - target) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    return r, step


def time_step(step, params, iters):
    for _ in range(WARMUP_ITERS):
        loss, grads = step(params)
    # Host FETCH of the loss, not block_until_ready: through the remote-TPU
    # tunnel block_until_ready both acks early for large outputs and pays a
    # per-call sync round-trip; fetching the final scalar of a pipelined
    # run measures true steady-state device throughput (what an actual
    # training loop, which never syncs per step, achieves). Identical
    # semantics on a local device.
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        step(params)
    float(step(params)[0])
    return (time.perf_counter() - t0) / iters


def measure(width, height, iters, use_pallas=False):
    r, step = build_step(width, height, use_pallas=use_pallas)
    dt = time_step(step, r.init_params, iters)
    return (width * height) / dt


_CPU_CHILD = """
import json, os, jax
os.environ['BENCH_FAST'] = '0'  # interpret-mode Pallas would handicap CPU
jax.config.update('jax_platforms', 'cpu')
import bench
print(json.dumps({'cpu_rays_per_sec': bench.measure(480, 270, iters=3)}))
"""


def cpu_baseline() -> float:
    out = subprocess.run(
        [sys.executable, "-c", _CPU_CHILD],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    line = out.stdout.strip().splitlines()[-1]
    return float(json.loads(line)["cpu_rays_per_sec"])


def main():
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    import jax

    on_accel = jax.default_backend() != "cpu"
    # Enough iterations that dispatch pipelines and the steady state
    # dominates (the remote tunnel needs ~100 to amortize its latency).
    iters = 100 if on_accel else 3
    rays_per_sec = measure(1920, 1080, iters=iters, use_pallas=use_pallas)
    try:
        cpu_rays = cpu_baseline()
        vs_baseline = round(rays_per_sec / (10.0 * cpu_rays), 3)
    except Exception as exc:  # CPU leg must never sink the benchmark
        print(f"cpu baseline failed: {exc}", file=sys.stderr)
        vs_baseline = None  # json NaN is not valid JSON; null is
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_fwd_bwd_1080p",
                "value": round(rays_per_sec),
                "unit": "rays/s/chip",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
