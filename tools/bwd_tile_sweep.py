"""Sweep backward-kernel tile size / VMEM limit / two-level recompute.

Each config runs in-process sequentially (module constants are rebound
before the jit trace). Usage:
    python tools/bwd_tile_sweep.py 64:none 128:64M 128:64M:2l
Prints ms/frame + Mrays/s fwd+bwd at 1080p per config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse(spec):
    parts = spec.split(":")
    tile = int(parts[0])
    lim = parts[1] if len(parts) > 1 else "none"
    limit = None if lim == "none" else int(float(lim.rstrip("Mm")) * 2**20)
    two_level = "2l" in parts[2:]
    unroll = next(
        (int(p[1:]) for p in parts[2:] if p.startswith("u")), 1
    )
    return tile, limit, two_level, unroll


def run(spec):
    import jax
    from ray_marching_tpu.ops import pallas_backward as pb
    import bench

    tile, limit, two_level, unroll = parse(spec)
    pb.BWD_ROWS_PER_TILE = tile
    pb.BWD_ROWS_PER_TILE_2L = tile
    pb.BWD_VMEM_LIMIT_BYTES = limit
    pb.BWD_UNROLL = unroll
    os.environ["RM_TPU_BWD_TWO_LEVEL"] = "1" if two_level else "0"
    r, step = bench.build_step(1920, 1080)
    try:
        t0 = time.perf_counter()
        dt = bench.time_step(step, r.init_params, iters=20)
        compile_s = time.perf_counter() - t0 - 20 * dt
    except Exception as exc:
        print(f"{spec}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return
    mrays = 1920 * 1080 / dt / 1e6
    # Label which backward actually ran: tile sizes whose padded rows
    # mismatch the forward's silently fall back to the in-kernel recompute
    # (no history handoff) — without this tag those rows would compare
    # handoff-vs-recompute instead of tile sizes.
    path = (
        "2l" if pb.LAST_PATH.get("two_level")
        else "hist" if pb.LAST_PATH.get("use_hist")
        else "recompute"
    )
    print(
        f"{spec}: {dt * 1e3:.2f} ms/frame  {mrays:.1f} Mrays/s  [{path}]"
        f"  (compile+warmup {compile_s:.0f}s)"
    )
    jax.clear_caches()


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        run(spec)
