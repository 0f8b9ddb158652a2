"""Command-line entry point.

Replaces the reference's edit-the-source configuration (hardcoded constants
in main.py:20-27, scene chosen by editing imports — SURVEY.md §5 config
system) with subcommands over the scene registry:

  python -m ray_marching_tpu.cli render   --scene test_scene2 -o out.png
  python -m ray_marching_tpu.cli gallery  --scene test_scene2 -o gallery/
  python -m ray_marching_tpu.cli optimize --scene test_scene2 --target t.png
  python -m ray_marching_tpu.cli interactive --frames 100 -o frames/
  python -m ray_marching_tpu.cli bench
  python -m ray_marching_tpu.cli profile  -o /tmp/trace
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _add_render_args(p):
    p.add_argument("--scene", default="test_scene2")
    p.add_argument("--scene-file", default=None,
                   help="JSON scene file (overrides --scene)")
    p.add_argument("--width", type=int, default=1440)
    p.add_argument("--height", type=int, default=900)
    p.add_argument("--px-size", type=float, default=3.45e-6)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--normals-eps", type=float, default=5e-2)
    p.add_argument("--dtype", default="float32",
                   choices=["bfloat16", "float16", "float32", "float64"])
    p.add_argument("--degree", type=int, default=2)
    p.add_argument("--pose", default="0,0,1,0/0,0.2,2.5",
                   help="qw,qx,qy,qz/x,y,z (default looks at the origin)")
    p.add_argument("--tau", type=float, default=0.0,
                   help="early-exit threshold (0 = reference-exact)")
    p.add_argument("--bounces", type=int, default=0,
                   help="reflection bounces")
    p.add_argument("--pallas", action="store_true",
                   help="use the fused Pallas marching kernel")
    p.add_argument("--fast", action="store_true",
                   help="plane-native renderer with the fused march+normals "
                        "mega-kernel")
    p.add_argument("--backward", default="unroll",
                   choices=["unroll", "implicit"])
    p.add_argument("--grid-dtype", default="float32",
                   choices=["float32", "float64"],
                   help="camera ray-grid construction dtype (float32 "
                        "reproduces the reference's f32 grid quirk, "
                        "camera.py; float64 builds exact pixel centers)")
    p.add_argument("--cmap-fourier", action="store_true",
                   help="gather-free tangent/spin colourmap (8-harmonic "
                        "Fourier fit, max err 0.02/255; ~2.3x faster "
                        "domain-coloured modes on TPU)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--compile-cache", nargs="?", const="", default=None,
                   metavar="DIR",
                   help="enable the persistent compilation cache (default "
                        "dir ~/.cache/ray_marching_tpu/jax_cache) — later "
                        "processes skip the 30-70s first TPU compile")
    p.add_argument("--params", default=None, metavar="CKPT",
                   help="scene-parameter checkpoint (.npz from "
                        "`optimize --save-params`) to render/optimize with "
                        "instead of the scene's initial parameters — the "
                        "optimize→view loop (reference README.md:22-23)")


def _initial_params(args, renderer):
    """Scene params for a command: the --params checkpoint when given
    (validated against this scene's pytree structure/shapes), otherwise the
    renderer's initial parameters."""
    path = getattr(args, "params", None)
    if not path:
        return renderer.init_params
    from pathlib import Path

    from ray_marching_tpu.io.checkpoint import load_pytree

    if not Path(path).exists():
        raise SystemExit(f"error: params checkpoint not found: {path}")
    return load_pytree(path, renderer.init_params)


def _build_renderer(args):
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "compile_cache", None) is not None:
        from ray_marching_tpu.runtime import enable_persistent_cache

        print(f"compilation cache: "
              f"{enable_persistent_cache(args.compile_cache or None)}")
    import jax.numpy as jnp

    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
    from ray_marching_tpu.scene import registry

    cfg = RenderConfig(
        px_width=args.width,
        px_height=args.height,
        focal_length=args.px_size * args.height,
        sensor_width=args.px_size * args.width,
        sensor_height=args.px_size * args.height,
        marching_steps=args.steps,
        normals_eps=args.normals_eps,
        tau=args.tau,
        reflection_bounces=args.bounces,
        use_pallas=args.pallas,
        backward=args.backward,
        cmap_fourier=getattr(args, "cmap_fourier", False),
    )
    grid_dtype = getattr(np, getattr(args, "grid_dtype", "float32"))
    if getattr(args, "scene_file", None):
        from pathlib import Path

        from ray_marching_tpu.scene.serialize import load_scene

        if not Path(args.scene_file).exists():
            raise SystemExit(f"error: scene file not found: {args.scene_file}")
        scene = load_scene(args.scene_file)
    else:
        scene = registry.make_scene(args.scene)
    if getattr(args, "strip_height", None):
        from ray_marching_tpu.render.tiled import TiledRenderer

        return TiledRenderer(scene, cfg, strip_height=args.strip_height,
                             dtype=getattr(jnp, args.dtype),
                             grid_dtype=grid_dtype)
    if getattr(args, "fast", False):
        from ray_marching_tpu.render.fast import FastRenderer

        return FastRenderer(scene, cfg, dtype=getattr(jnp, args.dtype),
                            grid_dtype=grid_dtype)
    return Renderer(scene, cfg, dtype=getattr(jnp, args.dtype),
                    grid_dtype=grid_dtype)


def _parse_mode(spec):
    """Shader mode from a name ('spin'), an extra lighting mode name
    ('occlusion'/'shaded' — render/lighting.py), or an index string ('7')."""
    from ray_marching_tpu.render.lighting import EXTRA_MODES
    from ray_marching_tpu.render.shaders import MODES

    if spec in EXTRA_MODES:
        return spec
    return MODES.index(spec) if spec in MODES else int(spec)


def _parse_pose(spec, dtype):
    import jax.numpy as jnp

    q_str, t_str = spec.split("/")
    q = np.asarray([float(v) for v in q_str.split(",")], np.float64)
    q = q / np.linalg.norm(q)
    t = [float(v) for v in t_str.split(",")]
    return jnp.asarray([q], dtype), jnp.asarray([t], dtype)


def cmd_render(args):
    from ray_marching_tpu.io.image import write_png

    renderer = _build_renderer(args)
    q, t = _parse_pose(args.pose, renderer.dtype)
    mode = _parse_mode(args.mode)
    image = renderer.jitted(mode=mode, degree=args.degree)(
        _initial_params(args, renderer), q, t
    )
    path = write_png(args.out, image)
    print(f"wrote {path}")


def cmd_gallery(args):
    from pathlib import Path

    from ray_marching_tpu.io.image import write_png

    renderer = _build_renderer(args)
    q, t = _parse_pose(args.pose, renderer.dtype)
    params = _initial_params(args, renderer)
    from ray_marching_tpu.render.tiled import TiledRenderer

    extras = not args.no_extras
    if isinstance(renderer, TiledRenderer):
        # Host-side strip loop (each pass jitted internally).
        images = renderer.render_all_modes(
            params, q, t, degree=args.degree, extras=extras
        )
    else:
        import jax

        fn = jax.jit(
            lambda p, q, t: renderer.render_all_modes(
                p, q, t, degree=args.degree, extras=extras
            )
        )
        images = fn(params, q, t)
    for name in images:
        path = write_png(Path(args.out) / f"{name}.png", images[name])
        print(f"wrote {path}")


def cmd_optimize(args):
    import jax.numpy as jnp

    from ray_marching_tpu.optim.inverse import InverseConfig, optimize

    renderer = _build_renderer(args)
    q, t = _parse_pose(args.pose, renderer.dtype)
    # nargs='*' can yield an EMPTY list, which would mean "perturb every
    # leaf" to the selftest below but "train no leaf" to InverseConfig's
    # mask — normalize to None (all trainable) so the two agree.
    trainable = args.trainable or None
    if args.target == "selftest":
        # Built-in demo: render the target from +20%-perturbed trainable
        # leaves, then recover them from the unperturbed init.
        from ray_marching_tpu.scene.graph import tree_map_with_path

        wanted = trainable or []
        true_params = tree_map_with_path(
            lambda path, leaf: leaf * 1.2
            if any(tp in path for tp in wanted) or not wanted
            else leaf,
            renderer.init_params,
        )
        # Jitted: an eager full render would dispatch op-by-op against the
        # TPU tunnel (CLAUDE.md).
        target = renderer.jitted(mode=args.optimize_mode, degree=args.degree)(
            true_params, q, t
        )
    else:
        target = jnp.asarray(_read_png(args.target)[None], renderer.dtype)

    cfg = InverseConfig(
        learning_rate=args.lr,
        steps=args.opt_steps,
        mode=args.optimize_mode,
        degree=args.degree,
        trainable=trainable,
        optimize_pose=args.optimize_pose,
        checkpoint_dir=args.checkpoint_dir,
        metrics_path=args.metrics,
    )
    # --params warm-starts training from a saved checkpoint (fresh
    # optimizer state; --checkpoint-dir resume restores both).
    out = optimize(renderer, target, q, t, cfg,
                   init_params=_initial_params(args, renderer))
    print(f"final loss: {out['losses'][-1]:.3e} after {out['steps_run']} steps")
    if args.save_params:
        from ray_marching_tpu.io.checkpoint import save_pytree

        save_pytree(args.save_params, out["params"])
        print(f"wrote {args.save_params}")


def _read_png(path):
    """Read a PNG target as float32 (H, W, 3) in [0, 1].

    PIL when available (fast C filter reconstruction, every colour type);
    otherwise a minimal pure reader (8-bit RGB/RGBA/grey/grey+alpha, no
    interlace) whose Sub filter is vectorized via modular cumsum — the
    Average/Paeth per-byte loops make large encoder-filtered PNGs slow,
    which is why PIL goes first."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.uint8)
        return arr.astype(np.float32) / 255.0
    except ImportError:
        pass
    import struct
    import zlib

    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat, meta = 8, b"", None
    while pos < len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            assert depth == 8 and interlace == 0, "unsupported PNG"
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
            meta = (w, h, channels)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    w, h, c = meta
    raw = zlib.decompress(idat)
    stride = w * c
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for row in range(h):
        filt = raw[pos]
        line = np.frombuffer(raw[pos + 1:pos + 1 + stride], np.uint8).copy()
        pos += 1 + stride
        if filt == 1:  # Sub — prefix sum per channel offset (mod 256)
            cols = line.reshape(w, c)
            line = np.cumsum(cols, axis=0, dtype=np.uint8).reshape(-1)
        elif filt == 2:  # Up
            line = (line + prev) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - c] if i >= c else 0
                line[i] = (line[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pr = a if abs(p - a) <= abs(p - b) and abs(p - a) <= abs(p - cc) \
                    else b if abs(p - b) <= abs(p - cc) else cc
                line[i] = (int(line[i]) + pr) & 0xFF
        out[row] = line
        prev = line
    img = out.reshape(h, w, c).astype(np.float32) / 255.0
    if c >= 3:
        return img[:, :, :3]
    # grey (c=1) or grey+alpha (c=2): broadcast the luma channel only —
    # np.repeat over c=2 would interleave alpha bytes into the RGB.
    return np.repeat(img[:, :, :1], 3, axis=-1)


def cmd_interactive(args):
    from ray_marching_tpu.viewer import (
        APNGSink,
        KittySink,
        MultiSink,
        PNGSink,
        PynputInput,
        TerminalSink,
        orbit_script,
        run_viewer,
    )

    renderer = _build_renderer(args)
    if args.orbit:
        source = orbit_script(args.frames)
    else:
        try:
            source = PynputInput()
        except Exception as exc:
            print(f"pynput unavailable ({exc}); falling back to --orbit")
            source = orbit_script(args.frames)
    sink = PNGSink(args.out, every=args.save_every)
    if args.apng:
        sink = MultiSink(sink, APNGSink(args.apng, fps=args.apng_fps))
    if args.display == "term":
        # Live ANSI half-block preview in the terminal + PNGs on disk.
        sink = MultiSink(TerminalSink(), sink)
    elif args.display == "kitty":
        # Pixel-perfect preview via the kitty graphics protocol.
        sink = MultiSink(KittySink(), sink)
    # Scroll cycle: the 8 reference modes, plus the named lighting modes
    # when --all-modes or when the initial --mode is one of them.
    from ray_marching_tpu.render.lighting import EXTRA_MODES

    mode0 = _parse_mode(args.mode)
    modes = list(range(8))
    if args.all_modes or isinstance(mode0, str):
        modes += list(EXTRA_MODES)
    start = modes.index(mode0 if isinstance(mode0, str) else mode0 % 8)
    from ray_marching_tpu.control import SessionState

    camera, session, frames = run_viewer(
        renderer, source, sink, max_frames=args.frames,
        params=_initial_params(args, renderer),
        modes=modes,
        session=SessionState(mode=start, marching_steps=args.steps),
        # Per-frame stdout lines corrupt the repaint-in-place cursor math
        # of BOTH terminal sinks (TerminalSink's relative cursor-up and
        # KittySink's saved-cursor restore).
        print_fps=args.display not in ("term", "kitty"),
        fetch_stride=args.fetch_stride,
    )
    print(f"rendered {frames} frames to {args.out}")


def cmd_bench(args):
    # bench.py lives at the repo root, not in the package: import it by
    # path so `cli bench` works from any CWD, and surface its env knobs as
    # flags.
    import importlib.util
    import os
    from pathlib import Path

    if args.backward:
        os.environ["BENCH_BACKWARD"] = args.backward
    if args.no_fast:
        os.environ["BENCH_FAST"] = "0"
    if args.pallas:
        os.environ["BENCH_PALLAS"] = "1"
    bench_path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench", bench_path)
    bench = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = bench
    spec.loader.exec_module(bench)
    bench.main()


def cmd_export(args):
    from ray_marching_tpu.io.export import export_render

    renderer = _build_renderer(args)
    mode = _parse_mode(args.mode)
    platforms = args.platforms.split(",") if args.platforms else None
    path = export_render(renderer, args.out, mode=mode, degree=args.degree,
                         platforms=platforms,
                         params=_initial_params(args, renderer))
    print(f"wrote {path}")


def cmd_serve(args):
    if args.interactive:
        # Browser live viewer: mouse-look + wasd + scroll mode cycling over
        # HTTP — the reference's interactive-window capability
        # (reference main.py:19-88, torchwindow/window.py:146-174) with no
        # display server needed.
        from ray_marching_tpu.control import SessionState
        from ray_marching_tpu.render.lighting import EXTRA_MODES
        from ray_marching_tpu.web import LiveViewer

        renderer = _build_renderer(args)
        mode0 = _parse_mode(args.mode)
        modes = list(range(8))
        if args.all_modes or isinstance(mode0, str):
            modes += list(EXTRA_MODES)
        start = modes.index(mode0 if isinstance(mode0, str) else mode0 % 8)
        viewer = LiveViewer(
            renderer, host=args.host, port=args.port,
            params=_initial_params(args, renderer), modes=modes,
            session=SessionState(mode=start, marching_steps=args.steps),
            max_fps=args.max_fps, idle_timeout=args.idle_timeout,
            fetch_stride=args.fetch_stride, save_dir=args.save_dir,
        )
        print(f"live viewer on http://{args.host}:{viewer.port}/ "
              f"(open in a browser; q in the page or Ctrl-C here quits)")
        try:
            viewer.run()
        except KeyboardInterrupt:
            pass
        finally:
            viewer.close()
        return
    if not args.artifact:
        raise SystemExit("serve: --artifact is required (or pass "
                         "--interactive for the browser live viewer)")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.compile_cache is not None:
        from ray_marching_tpu.runtime import enable_persistent_cache

        print(f"compilation cache: "
              f"{enable_persistent_cache(args.compile_cache or None)}")
    from ray_marching_tpu.serve import RenderServer

    server = RenderServer(args.artifact, host=args.host, port=args.port,
                          params_npz=args.params)
    print(f"serving {args.artifact} on http://{args.host}:{server.port} "
          f"(GET /render?pose=qw,qx,qy,qz/x,y,z)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


def cmd_profile(args):
    import jax

    renderer = _build_renderer(args)
    q, t = _parse_pose(args.pose, renderer.dtype)
    params = _initial_params(args, renderer)
    if args.grad:
        # Forward+backward under the trace: MSE-vs-zero loss, params +
        # pose cotangents — the bench.py fwd+bwd workload's op mix.
        import jax.numpy as jnp

        base = renderer.jitted(mode=args.profile_mode, degree=args.degree)

        def loss(p, q, t):
            img = base(p, q, t)
            return jnp.mean(jnp.square(jnp.nan_to_num(img, nan=0.0)))

        grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        fn = lambda p, q, t: grad_fn(p, q, t)[0]
    else:
        fn = renderer.jitted(mode=args.profile_mode, degree=args.degree)
    fn(params, q, t)  # compile outside the trace
    with jax.profiler.trace(args.out):
        for _ in range(args.frames):
            out = fn(params, q, t)
        jax.block_until_ready(out)
    print(f"wrote TensorBoard/XPlane trace to {args.out}")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ray_marching_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("render", help="render one frame to PNG")
    _add_render_args(p)
    p.add_argument("--mode", default="lambertian",
                   help="shader name or index (0..7)")
    p.add_argument("-o", "--out", default="render.png")
    p.add_argument("--strip-height", type=int, default=None, metavar="ROWS",
                   help="render in horizontal strips of this many pixel "
                        "rows (two-pass global normalizations) — images "
                        "bigger than one device pass, e.g. 8K/16K posters")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("gallery", help="render all shader modes (8 "
                                       "reference + occlusion/shaded)")
    _add_render_args(p)
    p.add_argument("--no-extras", action="store_true",
                   help="only the 8 reference modes (skip the named "
                        "lighting modes)")
    p.add_argument("-o", "--out", default="gallery_out")
    p.add_argument("--strip-height", type=int, default=None, metavar="ROWS",
                   help="render each mode in horizontal strips (galleries "
                        "bigger than one device pass)")
    p.set_defaults(fn=cmd_gallery)

    p = sub.add_parser("optimize", help="inverse rendering against a target")
    _add_render_args(p)
    p.add_argument("--target", default="selftest",
                   help="target PNG path, or 'selftest'")
    p.add_argument("--optimize-mode", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--opt-steps", type=int, default=100)
    p.add_argument("--trainable", nargs="*", default=None)
    p.add_argument("--optimize-pose", action="store_true")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--metrics", default=None)
    p.add_argument("--save-params", default=None)
    p.set_defaults(fn=cmd_optimize)

    p = sub.add_parser("interactive", help="interactive / orbit frame loop")
    _add_render_args(p)
    p.add_argument("--mode", default="lambertian",
                   help="initial shader: name, index (0..7), or a named "
                        "lighting mode (occlusion/shaded)")
    p.add_argument("--all-modes", action="store_true",
                   help="include the named lighting modes in the "
                        "scroll-wheel mode cycle (10 modes instead of 8)")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--orbit", action="store_true",
                   help="scripted orbit instead of mouse/keyboard")
    p.add_argument("--save-every", type=int, default=1)
    p.add_argument("-o", "--out", default="frames")
    p.add_argument("--display", choices=["none", "term", "kitty"],
                   default="none",
                   help="'term' = live ANSI half-block preview in-terminal; "
                        "'kitty' = pixel-perfect kitty-graphics preview")
    p.add_argument("--fetch-stride", type=int, default=1,
                   help="device-side pixel subsampling before the "
                        "device->host fetch (faster live preview over "
                        "thin links; saved PNGs are strided too)")
    p.add_argument("--apng", default=None, metavar="PATH",
                   help="additionally write all frames as one looping "
                        "animated PNG (no ffmpeg needed)")
    p.add_argument("--apng-fps", type=float, default=30.0)
    p.set_defaults(fn=cmd_interactive)

    p = sub.add_parser("bench", help="run the rays/s benchmark")
    p.add_argument("--backward", choices=["remat", "unroll", "implicit"],
                   default=None, help="backward mode (default remat)")
    p.add_argument("--no-fast", action="store_true",
                   help="modular pipeline instead of the fused fast path")
    p.add_argument("--pallas", action="store_true",
                   help="route the modular march through the Pallas kernel")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("export", help="export a serving artifact (.rmx: "
                                      "serialized StableHLO + scene params)")
    _add_render_args(p)
    p.add_argument("--mode", default="lambertian",
                   help="shader name or index (0..7)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms, e.g. cpu,tpu "
                        "(default: current backend)")
    p.add_argument("-o", "--out", default="model.rmx")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("serve", help="HTTP server: an exported-artifact "
                                     "pose endpoint (--artifact), or the "
                                     "browser live viewer (--interactive)")
    _add_render_args(p)  # also provides --params/--cpu/--compile-cache
    p.add_argument("--artifact", default=None, help=".rmx artifact path "
                   "(one-shot pose renders; ignored with --interactive)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8371)
    p.add_argument("--interactive", action="store_true",
                   help="serve the live mouse-look/wasd browser session "
                        "instead of the artifact endpoint (no X server "
                        "needed; builds the renderer from the render args)")
    p.add_argument("--mode", default="lambertian",
                   help="initial shader for --interactive (name or index)")
    p.add_argument("--all-modes", action="store_true",
                   help="include the named lighting modes in the scroll "
                        "cycle (--interactive)")
    p.add_argument("--max-fps", type=float, default=30.0,
                   help="render-loop throttle for --interactive")
    p.add_argument("--idle-timeout", type=float, default=None,
                   help="end the --interactive session after this many "
                        "seconds without client contact")
    p.add_argument("--fetch-stride", type=int, default=1,
                   help="device-side pixel subsampling before the fetch "
                        "(--interactive, thin links)")
    p.add_argument("--save-dir", default=None,
                   help="directory for p-key frame saves (--interactive)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("profile", help="write a jax.profiler trace")
    _add_render_args(p)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--grad", action="store_true",
                   help="trace forward+backward (value_and_grad of an MSE "
                        "loss) instead of forward only")
    p.add_argument("--profile-mode", type=int, default=0,
                   help="shader mode index to profile")
    p.add_argument("-o", "--out", default="/tmp/rm_tpu_trace")
    p.set_defaults(fn=cmd_profile)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
