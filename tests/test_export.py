"""AOT export + serving: .rmx artifacts (serialized StableHLO + scene
params) round-trip exactly, and the stdlib HTTP server answers pose
queries with PNG frames from a process that never touches the scene graph."""

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.io.export import export_render, load_render
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry

PX = 3.45e-6


@pytest.fixture(scope="module")
def renderer():
    cfg = RenderConfig(
        px_width=48, px_height=32,
        focal_length=PX * 32, sensor_width=PX * 48, sensor_height=PX * 32,
        marching_steps=8,
    )
    return Renderer(registry.make_scene("test_scene2"), cfg,
                    dtype=jnp.float32)


def test_export_roundtrip_exact(renderer, tmp_path):
    path = export_render(renderer, tmp_path / "m.rmx", mode=0, degree=1)
    fn, params, meta = load_render(path)
    q, t = renderer.default_pose()
    img = np.asarray(fn(params, q, t))
    ref = np.asarray(
        renderer.jitted(mode=0, degree=1)(renderer.init_params, q, t)
    )
    np.testing.assert_array_equal(img, ref)
    assert meta["mode"] == 0 and meta["px_width"] == 48
    assert meta["marching_steps"] == 8


def test_export_params_stay_inputs(renderer, tmp_path):
    """Bundled params are a runtime input: substituting an updated leaf
    (the optimize() hot-swap path) changes the render without re-export."""
    path = export_render(renderer, tmp_path / "m.rmx", mode=0)
    fn, params, _ = load_render(path)
    q, t = renderer.default_pose()
    a = np.asarray(fn(params, q, t))
    params2 = jax.tree.map(lambda x: x, params)
    params2["c1"]["c0"]["radius"] = jnp.asarray(0.9, jnp.float32)
    b = np.asarray(fn(params2, q, t))
    assert not np.array_equal(a, b)


def test_export_multi_platform(renderer, tmp_path):
    """Lowering for cpu+tpu from a CPU host: build the serving artifact
    anywhere, deploy on TPU."""
    path = export_render(renderer, tmp_path / "m.rmx", mode=5,
                         platforms=("cpu", "tpu"))
    fn, params, meta = load_render(path)
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]
    q, t = renderer.default_pose()
    assert np.asarray(fn(params, q, t)).shape == (1, 32, 48, 3)


def test_render_server_end_to_end(renderer, tmp_path):
    from ray_marching_tpu.cli import _read_png
    from ray_marching_tpu.serve import RenderServer

    artifact = export_render(renderer, tmp_path / "m.rmx", mode=0, degree=1)
    server = RenderServer(artifact, port=0)
    server.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
        meta = json.loads(urllib.request.urlopen(f"{base}/meta").read())
        assert meta["px_height"] == 32

        pose = "0,0,1,0/0,0.2,2.5"
        png = urllib.request.urlopen(f"{base}/render?pose={pose}").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        img_path = tmp_path / "got.png"
        img_path.write_bytes(png)
        got = _read_png(img_path)

        from ray_marching_tpu.cli import _parse_pose
        q, t = _parse_pose(pose, renderer.dtype)
        ref = np.asarray(
            renderer.jitted(mode=0, degree=1)(renderer.init_params, q, t)
        )[0]
        ref = np.nan_to_num(ref, nan=0.0)
        np.testing.assert_allclose(got, np.clip(ref, 0, 1), atol=1.0 / 255)

        # Bad pose -> 400, not a crash; wrong arity is also the caller's
        # fault (a (1, 3) "quaternion" would otherwise surface as a shape
        # error inside the handler -> 500).
        for bad in ("junk", "1,0,0/0,0,0", "1,0,0,0/0,0"):
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(f"{base}/render?pose={bad}")
            assert exc_info.value.code == 400, bad
    finally:
        server.close()


def test_persistent_cache_helper(tmp_path):
    from ray_marching_tpu.runtime import enable_persistent_cache

    d = enable_persistent_cache(tmp_path / "cache", min_compile_secs=0.5)
    assert d == str(tmp_path / "cache")
    assert (tmp_path / "cache").is_dir()
    assert jax.config.jax_compilation_cache_dir == d


def test_cli_export_subcommand(tmp_path):
    from ray_marching_tpu.cli import main

    out = tmp_path / "cli.rmx"
    main(["export", "--scene", "test_scene2", "--width", "32", "--height",
          "16", "--steps", "4", "--mode", "normal", "-o", str(out)])
    fn, params, meta = load_render(out)
    assert meta["mode"] == 4
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.2, 2.5]], jnp.float32)
    assert np.asarray(fn(params, q, t)).shape == (1, 16, 32, 3)


def test_export_sine_fast_neural_scene(tmp_path):
    """A sine_fast NeuralSDF exports through jax.export and round-trips
    exactly — the custom-JVP activation must lower on the forward-only
    serving path (round 5)."""
    from ray_marching_tpu.scene.neural import NeuralSDF

    cfg = RenderConfig(
        px_width=48, px_height=32,
        focal_length=PX * 32, sensor_width=PX * 48, sensor_height=PX * 32,
        marching_steps=6,
    )
    r = Renderer(
        NeuralSDF(hidden=(16, 16), seed=7, activation="sine_fast",
                  impl="matmul"),
        cfg, dtype=jnp.float32,
    )
    path = export_render(r, tmp_path / "nf.rmx", mode=0, degree=1)
    fn, params, meta = load_render(path)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    img = np.asarray(fn(params, q, t))
    ref = np.asarray(r.jitted(mode=0, degree=1)(r.init_params, q, t))
    np.testing.assert_array_equal(img, ref)
