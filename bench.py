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

Prints a forward-only JSON line first (informational), then the headline
line LAST (the driver parses the last line):
  {"metric": "rays_per_sec_fwd_1080p", ...}
  {"metric": "rays_per_sec_fwd_bwd_1080p", "value": <tpu rays/s>,
   "unit": "rays/s/chip", "vs_baseline": <tpu / (10 x cpu)>}

vs_baseline >= 1.0 means the BASELINE.md target (>=10x CPU rays/s per chip)
is met; the value itself is the headline rays/s on one chip.

Un-losable by construction (a round-3 driver run was lost to tunnel
slowness): the persistent compilation cache is enabled before anything
compiles (repeat runs skip the 30-70 s tunnel compiles entirely); every
stage streams progress to stderr so a timeout leaves a diagnosable tail;
the CPU leg runs concurrently in a subprocess; a provisional reduced-
iteration TPU number is recorded before the full timing run; and a
watchdog thread prints the best-available JSON line and exits 0 if
BENCH_DEADLINE seconds (default 450; a warm-cache run takes ~40 s,
cold ~110 s) pass — so even a hung tunnel yields a parsed, degraded
result instead of nothing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

BENCH_STEPS = 32
WARMUP_ITERS = 2
DEADLINE = float(os.environ.get("BENCH_DEADLINE", "450"))

_T0 = time.perf_counter()
# Best-so-far result, readable by the watchdog thread at any moment.
# "cpu_proc" holds the concurrent CPU-baseline Popen so the watchdog can
# reap it before hard-exiting (an orphaned leg burns a core for minutes).
_STATE: dict = {"value": None, "cpu_rays": None, "stage": "start",
                "cpu_proc": None}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def progress(msg: str) -> None:
    _STATE["stage"] = msg
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def emit(degraded: bool = False) -> None:
    """Print THE one JSON line (at most once, even under the watchdog)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    value = _STATE["value"]
    cpu = _STATE["cpu_rays"]
    vs = round(value / (10.0 * cpu), 3) if (value and cpu) else None
    out = {
        "metric": "rays_per_sec_fwd_bwd_1080p",
        "value": round(value) if value else None,
        "unit": "rays/s/chip",
        "vs_baseline": vs,
    }
    if degraded:
        out["degraded"] = f"deadline {DEADLINE}s hit at stage: {_STATE['stage']}"
    print(json.dumps(out), flush=True)


def _watchdog() -> None:
    """Emit the best-available result and hard-exit if the deadline passes.

    A thread (not SIGALRM) so it fires even while the main thread is stuck
    inside a blocking XLA compile / tunnel RPC.
    """
    remaining = DEADLINE - (time.perf_counter() - _T0)
    while remaining > 0:
        time.sleep(min(remaining, 5.0))
        remaining = DEADLINE - (time.perf_counter() - _T0)
    progress(f"DEADLINE ({DEADLINE}s) reached — emitting degraded result")
    emit(degraded=True)
    proc = _STATE.get("cpu_proc")
    if proc is not None and proc.poll() is None:
        try:
            proc.kill()
        except Exception:
            pass
    os._exit(0)


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


def start_cpu_baseline() -> subprocess.Popen:
    """Launch the CPU leg concurrently; collected at the end."""
    return subprocess.Popen(
        [sys.executable, "-c", _CPU_CHILD],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )


def collect_cpu_baseline(proc: subprocess.Popen, budget: float) -> float:
    out, _ = proc.communicate(timeout=max(budget, 30.0))
    line = out.strip().splitlines()[-1]
    return float(json.loads(line)["cpu_rays_per_sec"])


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    # Persistent compile cache BEFORE anything compiles: repeat runs (and
    # the driver's end-of-round run) skip the 30-70 s tunnel compiles.
    from ray_marching_tpu import runtime

    cache_dir = runtime.enable_persistent_cache()
    progress(f"compile cache at {cache_dir}")

    cpu_proc = start_cpu_baseline()
    _STATE["cpu_proc"] = cpu_proc
    progress("CPU leg started (concurrent subprocess)")

    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    import jax

    on_accel = jax.default_backend() != "cpu"
    progress(f"jax imported; backend={jax.default_backend()}")

    width, height = 1920, 1080
    r, step = build_step(width, height, use_pallas=use_pallas)
    progress("step built; compiling + warming up")

    # Warmup (includes compile) then a short pilot: a provisional number
    # exists from here on, so a watchdog fire mid-run still yields a result.
    pilot_iters = 10 if on_accel else 1
    dt = time_step(step, r.init_params, pilot_iters)
    _STATE["value"] = (width * height) / dt
    progress(
        f"compiled + pilot ({pilot_iters} iters): "
        f"{_STATE['value'] / 1e6:.1f}M rays/s provisional"
    )

    # Full timing run: enough iterations that dispatch pipelines and the
    # steady state dominates (the remote tunnel needs ~100 to amortize).
    iters = 100 if on_accel else 3
    dt = time_step(step, r.init_params, iters)
    _STATE["value"] = (width * height) / dt
    progress(f"{iters} iters timed: {_STATE['value'] / 1e6:.1f}M rays/s")

    # Forward-only leg (informational second metric; printed BEFORE the
    # headline line — the driver parses the LAST line). Skipped when the
    # remaining deadline budget could not absorb its compile.
    if DEADLINE - (time.perf_counter() - _T0) > 120.0:
        try:
            import jax.numpy as jnp

            q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
            t = jnp.asarray([[0.0, 0.2, 2.5]], jnp.float32)
            fwd = jax.jit(
                lambda p: jnp.mean(r.render(p, q, t, mode=0, degree=2))
            )
            for _ in range(WARMUP_ITERS):
                out = fwd(r.init_params)
            float(out)
            fwd_iters = 100 if on_accel else 3
            t0 = time.perf_counter()
            for _ in range(fwd_iters - 1):
                fwd(r.init_params)
            float(fwd(r.init_params))
            fdt = (time.perf_counter() - t0) / fwd_iters
            fwd_rays = (width * height) / fdt
            progress(f"forward-only: {fwd_rays / 1e6:.1f}M rays/s")
            print(
                json.dumps(
                    {
                        "metric": "rays_per_sec_fwd_1080p",
                        "value": round(fwd_rays),
                        "unit": "rays/s/chip",
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # informational only — never sink the run
            progress(f"forward-only leg failed: {exc}")

    try:
        budget = DEADLINE - (time.perf_counter() - _T0) - 15.0
        _STATE["cpu_rays"] = collect_cpu_baseline(cpu_proc, budget)
        progress(f"CPU leg done: {_STATE['cpu_rays'] / 1e3:.1f}K rays/s")
    except Exception as exc:  # CPU leg must never sink the benchmark
        progress(f"cpu baseline failed: {exc}")
        try:
            cpu_proc.kill()
        except Exception:
            pass
    emit()


if __name__ == "__main__":
    main()
