"""On-silicon proof of the AOT export kit (VERDICT r3 #5).

The `.rmx` / `.rmxs` round-trip tests run on the virtual CPU mesh only;
this tool runs on the REAL TPU and verifies that `jax.export`
serialize → deserialize → call of programs containing the Mosaic
custom-call (the fused mega-kernel + fused backward) reproduces the
directly-jitted results:

1. `.rmx` render artifact: FastRenderer (fused Pallas march) exported,
   reloaded, replayed; max |replay - direct| reported (expect 0.0 — the
   same executable bytes run).
2. `.rmxs` sharded train step on a 1-device mesh: export, reload, one
   step; loss + every updated parameter leaf compared to the direct
   `fast_train_step` call.

Prints one JSON line per check; record the outcome in docs/MULTICHIP.md.

Usage: python tools/aot_replay_check.py [--px 512] [--steps 16]
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def tree_max_diff(a, b):
    import jax
    import jax.numpy as jnp

    leaves = zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float64) - y.astype(jnp.float64))))
        for x, y in leaves
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ray_marching_tpu import runtime
    runtime.enable_persistent_cache()

    from ray_marching_tpu.io.export import (
        export_render, export_train_step, load_render, load_train_step,
    )
    from ray_marching_tpu.parallel import fast_sharding as fs
    from ray_marching_tpu.parallel.sharding import make_mesh
    from ray_marching_tpu.render.fast import FastRenderer
    from ray_marching_tpu.render.pipeline import RenderConfig
    from ray_marching_tpu.scene import registry

    backend = jax.default_backend()
    pxs = 3.45e-6
    w, h = args.px, args.px // 2
    cfg = RenderConfig(
        px_width=w, px_height=h, focal_length=pxs * h,
        sensor_width=pxs * w, sensor_height=pxs * h,
        marching_steps=args.steps,
    )
    fast = FastRenderer(registry.make_scene("test_scene2"), cfg,
                        dtype=jnp.float32)
    q, t = fast.default_pose()
    tmp = Path(tempfile.mkdtemp(prefix="rmx_aot_"))

    # --- 1. .rmx render artifact (Mosaic custom-call inside) ---
    path = export_render(fast, tmp / "render.rmx", mode=0, degree=1)
    render_fn, params, meta = load_render(path)
    direct = fast.jitted(mode=0, degree=1)(fast.init_params, q, t)
    replay = render_fn(params, q, t)
    jax.block_until_ready(replay)
    diff = float(jnp.max(jnp.abs(direct - replay)))
    print(json.dumps({
        "check": "rmx_render_replay", "backend": backend,
        "px": [w, h], "steps": args.steps,
        "platforms": meta["platforms"], "max_abs_diff": diff,
        "ok": bool(diff == 0.0),
    }), flush=True)

    # --- 2. .rmxs sharded train step on a 1-device mesh ---
    mesh = make_mesh((1,), ("rays",), devices=jax.devices()[:1])
    opt = optax.adam(1e-2)
    spath = export_train_step(fast, mesh, tmp / "step.rmxs", optimizer=opt,
                              mode=0, degree=1)
    step_fn, smeta = load_train_step(spath)
    direct_step = fs.fast_train_step(fast, mesh, opt, mode=0, degree=1)
    target = fs.target_planes(
        fast, mesh, jnp.full((1, h, w, 3), 0.25, jnp.float32)
    )
    opt_state = opt.init(fast.init_params)
    p1, s1, l1 = direct_step(fast.init_params, opt_state, target, q, t)
    p2, s2, l2 = step_fn(fast.init_params, opt_state, target, q, t)
    jax.block_until_ready(l2)
    pdiff = tree_max_diff(p1, p2)
    print(json.dumps({
        "check": "rmxs_train_step_replay", "backend": backend,
        "num_devices": smeta["num_devices"],
        "loss_direct": float(l1), "loss_replay": float(l2),
        "params_max_abs_diff": pdiff,
        "ok": bool(pdiff == 0.0 and float(l1) == float(l2)),
    }), flush=True)
    print(f"artifacts under {tmp}", file=sys.stderr)


if __name__ == "__main__":
    main()
