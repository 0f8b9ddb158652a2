"""Scripted-HTTP test of the browser live viewer (ray_marching_tpu.web).

Drives a real LiveViewer session over HTTP exactly as the page's
JavaScript would — mouse-look drag, wasd movement, scroll mode-cycling,
quit — with no browser and no display server (the reference's interactive
window capability, reference main.py:19-88, torchwindow/window.py:146-174,
re-hosted over HTTP)."""

import json
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.web import LiveViewer

PX = 3.45e-6


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, dict(r.headers), r.read()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, r.read()


def _state(port):
    return json.loads(_get(port, "/state")[2])


def _next_frame(port, after):
    status, headers, body = _get(port, f"/frame.png?after={after}")
    return status, int(headers.get("X-Seq", "0")), body


@pytest.fixture()
def viewer():
    w, h = 48, 32
    cfg = RenderConfig(
        px_width=w, px_height=h, focal_length=PX * h,
        sensor_width=PX * w, sensor_height=PX * h, marching_steps=4,
    )
    r = Renderer(registry.make_scene("single_sphere"), cfg)
    v = LiveViewer(r, port=0, max_fps=120.0)
    v.start()
    try:
        yield v
    finally:
        v.close()


def test_live_session(viewer):
    port = viewer.port

    # Page + health.
    status, _, page = _get(port, "/")
    assert status == 200 and b"frame.png" in page and b"/input" in page
    assert _get(port, "/healthz")[0] == 200

    # First client contact starts the render loop; a real PNG comes back.
    _post(port, "/input", {})
    status, seq, body = _next_frame(port, after=0)
    assert status == 200 and seq >= 1
    assert body[:8] == b"\x89PNG\r\n\x1a\n"

    # WASD: hold 'w' (+Z camera frame) for a few frames -> z increases.
    z0 = _state(port)["position"][2]
    _post(port, "/input", {"pressed": ["w"]})
    for _ in range(3):
        _, seq, _ = _next_frame(port, after=seq)
    _post(port, "/input", {"pressed": []})
    _, seq, _ = _next_frame(port, after=seq)
    s = _state(port)
    assert s["position"][2] > z0 + 1e-4

    # Mouse-look: NDC offset from centre integrates into the quaternion.
    q0 = np.asarray(_state(port)["orientation"])
    _post(port, "/input", {"mouse_ndc": [0.5, 0.0]})
    for _ in range(2):
        _, seq, _ = _next_frame(port, after=seq)
    _post(port, "/input", {"mouse_ndc": [0.0, 0.0]})
    _, seq, _ = _next_frame(port, after=seq)
    q1 = np.asarray(_state(port)["orientation"])
    assert not np.allclose(q0, q1, atol=1e-5)
    assert np.isclose(np.linalg.norm(q1), 1.0, atol=1e-5)  # stays a versor

    # Scroll cycles the shader mode (SessionState.step semantics).
    mode0 = _state(port)["mode"]
    _post(port, "/input", {"scroll": 1})
    for _ in range(2):
        _, seq, _ = _next_frame(port, after=seq)
    assert _state(port)["mode"] == mode0 + 1

    # Malformed input -> 400, counted; session unaffected.
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/input", data=b"not json", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as exc:
        raised = exc.code == 400
    assert raised
    assert _state(port)["stats"]["errors_400"] >= 1

    # Quit ends the run_viewer loop.
    _post(port, "/input", {"quit": True})
    assert viewer.wait(timeout=30.0)
    assert _state(port)["running"] is False
    assert _state(port)["frames_rendered"] >= 5


def test_q_key_quits(viewer):
    port = viewer.port
    _post(port, "/input", {"pressed": ["q"]})
    assert viewer.wait(timeout=30.0)


def test_idle_timeout():
    w, h = 48, 32
    cfg = RenderConfig(
        px_width=w, px_height=h, focal_length=PX * h,
        sensor_width=PX * w, sensor_height=PX * h, marching_steps=4,
    )
    r = Renderer(registry.make_scene("single_sphere"), cfg)
    v = LiveViewer(r, port=0, max_fps=120.0, idle_timeout=0.2)
    v.start()
    try:
        _post(v.port, "/input", {})  # connect, then go silent
        assert v.wait(timeout=30.0)  # the dead tab can't POST quit
    finally:
        v.close()


def test_idle_pause_and_resume():
    """After pause_after seconds with no client contact the render loop
    PAUSES (no frames, no device work — a closed tab can't send quit);
    the next frame fetch resumes it (round-5 review finding)."""
    import time

    w, h = 48, 32
    cfg = RenderConfig(
        px_width=w, px_height=h, focal_length=PX * h,
        sensor_width=PX * w, sensor_height=PX * h, marching_steps=4,
    )
    r = Renderer(registry.make_scene("single_sphere"), cfg)
    v = LiveViewer(r, port=0, max_fps=120.0, pause_after=0.3)
    v.start()
    try:
        _post(v.port, "/input", {})
        _next_frame(v.port, after=0)
        time.sleep(1.0)  # go silent past pause_after
        n1 = _state(v.port)["frames_rendered"]  # /state does NOT touch
        time.sleep(0.7)
        n2 = _state(v.port)["frames_rendered"]
        assert n2 <= n1 + 1  # paused: no frame churn while unattended
        status, seq, _ = _next_frame(v.port, after=n2)  # fetch = contact
        assert status in (200, 204)
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if _state(v.port)["frames_rendered"] > n2 + 1:
                break
            time.sleep(0.1)
        assert _state(v.port)["frames_rendered"] > n2 + 1  # resumed
        _post(v.port, "/input", {"quit": True})
        assert v.wait(timeout=30.0)
    finally:
        v.close()
