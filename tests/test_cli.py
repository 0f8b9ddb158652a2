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
