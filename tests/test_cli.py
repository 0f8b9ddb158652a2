"""CLI + viewer: subcommands drive the pipeline end-to-end (CPU)."""

import numpy as np
import pytest

from ray_marching_tpu import cli


def run(argv):
    cli.main(argv)


BASE = ["--width", "48", "--height", "32", "--steps", "8"]


def test_render_writes_png(tmp_path):
    out = tmp_path / "img.png"
    run(["render", *BASE, "--mode", "normal", "-o", str(out)])
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 100


def test_render_mode_by_index(tmp_path):
    out = tmp_path / "img.png"
    run(["render", *BASE, "--mode", "4", "-o", str(out)])
    assert out.exists()


def test_gallery_writes_all_modes(tmp_path):
    run(["gallery", *BASE, "-o", str(tmp_path)])
    from ray_marching_tpu.render.shaders import MODES

    for name in MODES:
        assert (tmp_path / f"{name}.png").exists(), name


def test_optimize_selftest_reduces_loss(capsys, tmp_path):
    run([
        "optimize", *BASE,
        "--trainable", "c1/c0/radius",
        "--opt-steps", "40", "--lr", "2e-2",
        "--metrics", str(tmp_path / "m.jsonl"),
    ])
    out = capsys.readouterr().out
    assert "final loss" in out
    assert (tmp_path / "m.jsonl").exists()


def test_interactive_orbit(tmp_path):
    run([
        "interactive", *BASE, "--orbit", "--frames", "3",
        "--save-every", "1", "-o", str(tmp_path),
    ])
    assert (tmp_path / "frame_00000.png").exists()
    assert (tmp_path / "frame_00002.png").exists()


def test_png_roundtrip(tmp_path):
    from ray_marching_tpu.io.image import write_png

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
    p = write_png(tmp_path / "x.png", img)
    back = cli._read_png(p)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-7)


def test_unknown_scene_errors():
    with pytest.raises(KeyError):
        run(["render", "--scene", "nope", "-o", "/tmp/x.png"])


def test_scene_file_roundtrip_and_render(tmp_path):
    from ray_marching_tpu.scene import registry
    from ray_marching_tpu.scene.serialize import load_scene, save_scene

    node = registry.make_scene("test_scene")
    p = save_scene(tmp_path / "scene.json", node)
    assert load_scene(p) == node  # frozen dataclasses: structural equality

    out = tmp_path / "img.png"
    run(["render", *BASE, "--scene-file", str(p), "--mode", "0", "-o", str(out)])
    assert out.exists()


def test_scene_file_neural_roundtrip(tmp_path):
    from ray_marching_tpu.scene import registry
    from ray_marching_tpu.scene.serialize import load_scene, save_scene

    node = registry.make_scene("neural_demo")
    p = save_scene(tmp_path / "scene.json", node)
    assert load_scene(p) == node


def test_scene_file_bad_type_errors(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"type": "Nope"}')
    from ray_marching_tpu.scene.serialize import load_scene

    with pytest.raises(ValueError, match="unknown scene node type"):
        load_scene(p)


def test_render_fourier_cmap_and_f64_grid(tmp_path):
    out = tmp_path / "spin.png"
    run(["render", *BASE, "--mode", "spin", "--cmap-fourier",
         "--grid-dtype", "float64", "-o", str(out)])
    assert out.exists()


def test_optimize_then_view_roundtrip(tmp_path):
    """The optimize→view loop (VERDICT r2 #2): train, save, re-render via
    --params; the image must differ from the init render and match an
    in-process render with the loaded params."""
    ckpt = tmp_path / "ckpt.npz"
    run([
        "optimize", *BASE,
        "--trainable", "c1/c0/radius",
        "--opt-steps", "25", "--lr", "2e-2",
        "--save-params", str(ckpt),
    ])
    assert ckpt.exists()
    init_png = tmp_path / "init.png"
    opt_png = tmp_path / "opt.png"
    run(["render", *BASE, "--mode", "normal", "-o", str(init_png)])
    run(["render", *BASE, "--mode", "normal", "--params", str(ckpt),
         "-o", str(opt_png)])
    a = cli._read_png(init_png)
    b = cli._read_png(opt_png)
    assert not np.allclose(a, b), "optimized params did not change the render"

    # In-process render with the loaded params == the CLI's --params image.
    import jax.numpy as jnp

    from ray_marching_tpu.io.checkpoint import load_pytree
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
    from ray_marching_tpu.scene import registry

    cfg = RenderConfig(
        px_width=48, px_height=32,
        focal_length=3.45e-6 * 32, sensor_width=3.45e-6 * 48,
        sensor_height=3.45e-6 * 32, marching_steps=8,
    )
    r = Renderer(registry.make_scene("test_scene2"), cfg)
    params = load_pytree(ckpt, r.init_params)
    q, t = cli._parse_pose("0,0,1,0/0,0.2,2.5", r.dtype)
    want = np.asarray(r.jitted(mode=4, degree=2)(params, q, t))[0]
    want = np.nan_to_num(np.clip(want, 0, 1), nan=0.0)
    np.testing.assert_allclose(b, want, atol=1.5 / 255)


def test_params_missing_file_errors(tmp_path):
    with pytest.raises(SystemExit, match="not found"):
        run(["render", *BASE, "--params", str(tmp_path / "nope.npz"),
             "-o", str(tmp_path / "x.png")])


def test_gallery_includes_lighting_extras(tmp_path):
    """The gallery bundle ships 10 images: 8 reference modes + the named
    lighting modes (VERDICT r2 #5)."""
    run(["gallery", *BASE, "-o", str(tmp_path)])
    from ray_marching_tpu.render.lighting import EXTRA_MODES
    from ray_marching_tpu.render.shaders import MODES

    for name in list(MODES) + list(EXTRA_MODES):
        assert (tmp_path / f"{name}.png").exists(), name
    run(["gallery", *BASE, "--no-extras", "-o", str(tmp_path / "plain")])
    assert not (tmp_path / "plain" / "occlusion.png").exists()


def test_interactive_named_lighting_mode(tmp_path):
    """interactive accepts a named lighting mode as the initial shader and
    renders with it (VERDICT r2 #10)."""
    run([
        "interactive", *BASE, "--orbit", "--frames", "2",
        "--mode", "occlusion", "-o", str(tmp_path),
    ])
    img = cli._read_png(tmp_path / "frame_00000.png")
    # occlusion is a grey intensity channel: R == G == B everywhere.
    assert np.array_equal(img[..., 0], img[..., 1])
    assert np.array_equal(img[..., 0], img[..., 2])
    assert img.std() > 0  # not a constant frame


def test_interactive_all_modes_cycle(tmp_path):
    """--all-modes extends the scroll cycle to 10 entries; scrolling from
    spin (7) lands on occlusion (8), not back on lambertian."""
    from ray_marching_tpu.control import InputSnapshot, SessionState
    from ray_marching_tpu.render.lighting import EXTRA_MODES

    modes = list(range(8)) + list(EXTRA_MODES)
    s = SessionState(mode=7, marching_steps=8)
    s = s.step(InputSnapshot(scroll=1))
    assert modes[s.mode % len(modes)] == "occlusion"
    s = s.step(InputSnapshot(scroll=2))
    assert modes[s.mode % len(modes)] == 0


def test_serve_requires_artifact_or_interactive():
    """`cli serve` without --artifact and without --interactive must fail
    with a clear SystemExit, not an attribute error deep in loading."""
    import pytest

    from ray_marching_tpu.cli import main

    with pytest.raises(SystemExit, match="artifact"):
        main(["serve"])
