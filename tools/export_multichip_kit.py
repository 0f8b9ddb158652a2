"""Export the multi-chip readiness kit: AOT sharded train steps.

Serializes the sharded fused inverse-rendering train step
(parallel/fast_sharding.fast_train_step) for a set of mesh sizes, so pod
benchmarking time is pure measurement — no per-size Python tracing or
jit compilation on the clock (see docs/MULTICHIP.md, the runbook).

Run ON THE TARGET SLICE (artifacts bake the platform and device count):

    python tools/export_multichip_kit.py -o kit/ --meshes 4 8 16

Dev-box compile-check over the virtual CPU mesh (what CI pins):

    JAX_PLATFORMS=cpu python tools/export_multichip_kit.py \
        --cpu-devices 8 --meshes 2 4 8 --px 256 -o /tmp/kit
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--px", type=int, default=1024,
                    help="square frame edge (pod runs: 3840×2160 via "
                         "--width/--height)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--scene", default="test_scene2")
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="force CPU with this many virtual devices")
    ap.add_argument("-o", "--out", default="multichip_kit")
    args = ap.parse_args()

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    import jax.numpy as jnp

    from ray_marching_tpu.io.export import export_train_step
    from ray_marching_tpu.parallel.sharding import make_mesh
    from ray_marching_tpu.render.fast import FastRenderer
    from ray_marching_tpu.render.pipeline import RenderConfig
    from ray_marching_tpu.scene import registry

    w = args.width or args.px
    h = args.height or args.px
    px = 3.45e-6
    node = registry.make_scene(args.scene)
    n_avail = len(jax.devices())
    out_dir = Path(args.out)
    for n in args.meshes:
        if n > n_avail:
            print(f"skip mesh {n}: only {n_avail} devices", flush=True)
            continue
        cfg = RenderConfig(
            px_width=w, px_height=h,
            focal_length=px * h, sensor_width=px * w, sensor_height=px * h,
            marching_steps=args.steps,
        )
        fast = FastRenderer(node, cfg, dtype=jnp.float32, row_multiple=8 * n)
        mesh = make_mesh((n,), ("rays",), devices=jax.devices()[:n])
        path = export_train_step(
            fast, mesh, out_dir / f"train_step_{w}x{h}_d{n}.rmxs",
            mode=args.mode,
        )
        meta = json.loads(
            __import__("zipfile").ZipFile(path).read("meta.json")
        )
        print(json.dumps({"artifact": str(path), **{
            k: meta[k] for k in ("num_devices", "platforms", "rows")
        }}), flush=True)


if __name__ == "__main__":
    main()
