"""Viewer frame loop: scripted input drives mode/steps changes and sinks."""

import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.control import InputSnapshot
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.viewer import PNGSink, ScriptedInput, run_viewer

PX = 3.45e-6


def make_renderer():
    cfg = RenderConfig(
        px_width=32, px_height=16,
        focal_length=PX * 16, sensor_width=PX * 32, sensor_height=PX * 16,
        marching_steps=6,
    )
    return Renderer(registry.make_scene("test_scene2"), cfg, dtype=jnp.float32)


def test_mode_cycling_and_step_changes(tmp_path):
    frames = []

    def sink(idx, image, session):
        frames.append((idx, session.mode, session.marching_steps, np.asarray(image)))

    script = ScriptedInput([
        InputSnapshot(),
        InputSnapshot(scroll=1),               # mode 0 -> 1
        InputSnapshot(pressed=frozenset("m")),  # steps 6 -> 7
        InputSnapshot(quit=True),
    ])
    camera, session, n = run_viewer(
        make_renderer(), script, sink, print_fps=False
    )
    assert n == 3
    assert [f[1] for f in frames] == [0, 1, 1]
    assert [f[2] for f in frames] == [6, 6, 7]
    assert not session.running


def test_png_sink_save_frame_and_every(tmp_path):
    sink = PNGSink(str(tmp_path), every=10)
    script = ScriptedInput([
        InputSnapshot(),                      # frame 0: written (every)
        InputSnapshot(),                      # frame 1: skipped
        InputSnapshot(save_frame=True),       # frame 2: forced write ('p' key)
        InputSnapshot(quit=True),
    ])
    run_viewer(make_renderer(), script, sink, print_fps=False)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["frame_00000.png", "frame_00002.png"]


def test_render_is_deterministic():
    r = make_renderer()
    q, t = r.default_pose()
    f = r.jitted(mode=0, degree=1)
    a = np.asarray(f(r.init_params, q, t))
    b = np.asarray(f(r.init_params, q, t))
    np.testing.assert_array_equal(a, b)


def test_terminal_sink_renders_ansi_halfblocks():
    """TerminalSink: truecolor half-block preview, NaN-safe, repaint-in-
    place escape after the first frame."""
    import io

    from ray_marching_tpu.viewer import TerminalSink

    buf = io.StringIO()
    sink = TerminalSink(max_cols=16, max_rows=8, file=buf)
    img = np.zeros((1, 16, 16, 3), np.float32)
    img[0, :8] = [1.0, 0.0, 0.0]          # top half red
    img[0, 8:] = [0.0, 0.0, 1.0]          # bottom half blue
    img[0, 0, 0] = np.nan                 # NaN must render black, not crash

    class S:
        save_frame = False

    sink(0, img, S())
    out = buf.getvalue()
    assert "▀" in out and "\x1b[38;2;255;0;0m" in out and "\x1b[48;2;0;0;255m" in out
    assert "\x1b[38;2;0;0;0m" in out     # the NaN pixel
    assert "\x1b[F" not in out           # first frame: no cursor-up
    first_len = len(out)
    sink(1, img, S())
    assert "\x1b[8F" in buf.getvalue()[first_len:]  # repaint in place


def test_multi_sink_fans_out(tmp_path):
    from ray_marching_tpu.viewer import MultiSink

    calls = []
    sink = MultiSink(lambda *a: calls.append("a"), None,
                     lambda *a: calls.append("b"))
    sink(0, np.zeros((1, 2, 2, 3)), None)
    assert calls == ["a", "b"]


def test_jit_cache_is_lru_bounded():
    """Scrubbing marching_steps beyond the cache size evicts instead of
    accumulating compiled functions forever (round-1 weakness #7)."""
    jitted_calls = []

    class FakeRenderer:
        dtype = jnp.float32

        class config:
            marching_steps = 4

        init_params = {}

        def jitted(self, *, mode, marching_steps, degree):
            jitted_calls.append((mode, marching_steps, degree))
            return lambda p, q, t: np.zeros((1, 2, 2, 3), np.float32)

    # 6 distinct step counts with cache size 2, then revisit the first:
    # every step change misses (recompiles), including the revisit.
    snaps = [InputSnapshot(pressed=frozenset("m")) for _ in range(5)]
    source = ScriptedInput(snaps)
    run_viewer(FakeRenderer(), source, lambda *a: None,
               print_fps=False, jit_cache_size=2)
    assert len(jitted_calls) == len({k for k in jitted_calls}) == 5


def test_pynput_input_with_stubbed_backend(monkeypatch):
    """PynputInput's callback→snapshot logic, driven through a stubbed
    pynput module (no display server in CI): mouse NDC offsets, scroll
    accumulation + reset, key press/release sets, quit and save flags."""
    import sys
    import types

    captured = {}

    class FakeListener:
        def __init__(self, **callbacks):
            captured.update(callbacks)

        def start(self):
            pass

        def stop(self):
            pass

    fake = types.ModuleType("pynput")
    fake.mouse = types.SimpleNamespace(Listener=FakeListener)
    fake.keyboard = types.SimpleNamespace(Listener=FakeListener)
    monkeypatch.setitem(sys.modules, "pynput", fake)

    from ray_marching_tpu.viewer import PynputInput

    src = PynputInput(screen_size=(200, 100))
    snap = src.poll()
    assert snap.mouse_ndc == (0.0, 0.0) and not snap.quit

    captured["on_move"](150, 75)          # → NDC (+0.5, +0.5)
    captured["on_scroll"](0, 0, 0, 1)
    captured["on_scroll"](0, 0, 0, 1)
    key_w = types.SimpleNamespace(char="w")
    captured["on_press"](key_w)
    snap = src.poll()
    assert snap.mouse_ndc == (0.5, 0.5)
    assert snap.scroll == 2 and "w" in snap.pressed
    snap = src.poll()
    assert snap.scroll == 0               # scroll resets each poll

    captured["on_release"](key_w)
    captured["on_press"](types.SimpleNamespace(char="p"))
    snap = src.poll()
    assert "w" not in snap.pressed and snap.save_frame
    assert not src.poll().save_frame      # save flag is one-shot

    captured["on_press"](types.SimpleNamespace(char="q"))
    assert src.poll().quit
    src.close()


def test_kitty_sink_emits_valid_graphics_protocol():
    """KittySink: APC-framed base64 PNG chunks, repaint-in-place escapes,
    NaN-safe (encode_png maps NaN to black)."""
    import base64
    import io
    import re

    import numpy as np

    from ray_marching_tpu.viewer import KittySink

    buf = io.StringIO()
    sink = KittySink(file=buf)
    img = np.random.default_rng(0).random((1, 8, 16, 3))
    img[0, 0, 0] = np.nan
    sink(0, img, None)
    sink(1, img, None)
    out = buf.getvalue()
    # Frame 2 deletes the previous placement and restores the cursor.
    assert "\x1b[s" in out and "\x1b[u" in out
    assert "\x1b_Ga=d,d=A,q=2\x1b\\" in out
    # Reassemble the first frame's chunked payload → valid PNG.
    apcs = re.findall(r"\x1b_G([^;\x1b]*);([^\x1b]*)\x1b\\\\?", out)
    payload, collecting = "", False
    for ctrl, data in apcs:
        if ctrl.startswith("a=T"):
            payload, collecting = data, True
            if "m=1" not in ctrl:
                break
        elif collecting:
            payload += data
            if "m=1" not in ctrl:
                break
    png = base64.standard_b64decode(payload)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # Every transmission chunk stays within the 4096-byte protocol limit.
    assert all(len(d) <= 4096 for _, d in apcs)


def test_uint8_transfer_and_fetch_stride(tmp_path):
    """Frames reach the sink as device-quantized uint8 (4x less
    device->host transfer than float32 — the interactive-FPS bottleneck on
    thin links); fetch_stride subsamples on device before the fetch. The
    quantized bytes must equal host-side quantization of the float render."""
    from ray_marching_tpu.viewer import ScriptedInput

    r = make_renderer()
    frames = []
    script = ScriptedInput([InputSnapshot() for _ in range(2)])
    run_viewer(r, script, lambda i, img, s: frames.append(np.asarray(img)),
               print_fps=False, fetch_stride=2)
    assert frames[0].dtype == np.uint8
    h, w = r.config.px_height, r.config.px_width
    assert frames[0].shape == (1, (h + 1) // 2, (w + 1) // 2, 3)

    from ray_marching_tpu.control import CameraState
    cam = CameraState.initial(dtype=r.dtype)
    ref = np.asarray(r.render(r.init_params, cam.orientation, cam.position,
                              mode=0, degree=1))[:, ::2, ::2]
    ref = np.nan_to_num(ref, nan=0.0, posinf=1.0, neginf=0.0)
    ref8 = (np.clip(ref, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(frames[0], ref8)


def test_png_sink_uint8_frames_not_blown_out(tmp_path):
    """The default uint8 transfer hands device-quantized (N,H,W,3) uint8
    frames to PNGSink; write_png must keep them 0-255, not re-clip them to
    [0,1] after the camera-mean float promotion (which binarized every
    saved frame to black/white)."""
    from ray_marching_tpu.cli import _read_png
    from ray_marching_tpu.io.image import write_png

    img = np.zeros((1, 4, 4, 3), np.uint8)
    img[0, :2] = 10
    img[0, 2:] = 200
    path = write_png(tmp_path / "u8.png", img)
    back = _read_png(path)
    np.testing.assert_array_equal((back * 255.0 + 0.5).astype(np.uint8),
                                  img[0])

    # End-to-end: the PNGs saved by the default viewer loop must match the
    # float32-transfer PNGs exactly (same on-device quantization rule).
    r = make_renderer()
    for transfer, sub in (("uint8", "a"), ("float32", "b")):
        script = ScriptedInput([InputSnapshot()])
        run_viewer(r, script, PNGSink(str(tmp_path / sub)), print_fps=False,
                   transfer=transfer)
    a = _read_png(tmp_path / "a" / "frame_00000.png")
    b = _read_png(tmp_path / "b" / "frame_00000.png")
    assert a.std() > 0.01, "saved frame is flat — quantization blowout"
    np.testing.assert_allclose(a, b, atol=1.5 / 255.0)


def test_write_apng_roundtrip(tmp_path):
    """The dependency-free APNG writer produces a spec-valid animation:
    decoded frame count, loop count, and per-frame pixels all match."""
    from PIL import Image

    from ray_marching_tpu.io.image import write_apng

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
              for _ in range(4)]
    path = write_apng(tmp_path / "anim.png", frames, fps=20)
    with Image.open(path) as im:
        assert im.is_animated and im.n_frames == 4
        assert im.info.get("loop", 0) == 0  # infinite
        for i, expect in enumerate(frames):
            im.seek(i)
            np.testing.assert_array_equal(
                np.asarray(im.convert("RGB")), expect
            )
            assert abs(im.info["duration"] - 50.0) < 1e-6  # 1000/20 ms


def test_apng_sink_via_viewer(tmp_path):
    """run_viewer finalizes accumulating sinks: an orbit session writes one
    animated PNG whose frames are the rendered (quantized) frames."""
    from PIL import Image

    from ray_marching_tpu.viewer import APNGSink, orbit_script

    r = make_renderer()
    path = tmp_path / "orbit.png"
    run_viewer(r, orbit_script(3), APNGSink(path, fps=10), print_fps=False)
    with Image.open(path) as im:
        assert im.is_animated and im.n_frames == 3
        h, w = r.config.px_height, r.config.px_width
        assert im.size == (w, h)


def test_float32_transfer_honors_fetch_stride():
    """fetch_stride must subsample the fetch for raw float32 transfer too,
    not only for the uint8 path."""
    r = make_renderer()
    frames = []
    script = ScriptedInput([InputSnapshot()])
    run_viewer(r, script, lambda i, img, s: frames.append(np.asarray(img)),
               print_fps=False, transfer="float32", fetch_stride=2)
    h, w = r.config.px_height, r.config.px_width
    assert frames[0].dtype == np.float32
    assert frames[0].shape == (1, (h + 1) // 2, (w + 1) // 2, 3)
