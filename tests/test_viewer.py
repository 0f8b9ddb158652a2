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
