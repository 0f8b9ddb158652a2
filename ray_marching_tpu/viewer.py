"""Interactive frame loop: input → pose integration → render → sink.

The TPU-native replacement for the reference's main loop + CUDA↔OpenGL
window (main.py:19-88, torchwindow/): frames come back device→host and go
to a pluggable sink (PNG stream by default; no zero-copy display path
exists on TPU — SURVEY.md §2.6). Input comes from a pluggable source: the
scripted source for tests/headless use, or a pynput-backed source when a
real keyboard/mouse is present — with a single-writer snapshot handoff
instead of the reference's cross-thread mutable state.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterable, Optional

import jax

from ray_marching_tpu.control import (
    CameraState,
    ControlConfig,
    InputSnapshot,
    SessionState,
    apply_input,
)
from ray_marching_tpu.io.image import write_png


class ScriptedInput:
    """Replays a fixed sequence of snapshots, then quits."""

    def __init__(self, snapshots: Iterable[InputSnapshot]):
        self._it = iter(snapshots)

    def poll(self) -> InputSnapshot:
        try:
            return next(self._it)
        except StopIteration:
            return InputSnapshot(quit=True)

    def close(self):
        pass


class PynputInput:
    """Mouse/keyboard listener (requires pynput and a display server).

    Listener callbacks write to private fields; :meth:`poll` snapshots them
    — the render loop never reads mutating state mid-frame.
    """

    def __init__(self, screen_size=(1920, 1080)):
        import threading

        from pynput import keyboard, mouse  # noqa: deferred optional dep

        self._mouse_pos = (screen_size[0] // 2, screen_size[1] // 2)
        self._centre = (screen_size[0] // 2, screen_size[1] // 2)
        self._pressed = set()
        self._scroll = 0
        self._quit = False
        self._save = False
        # Listener callbacks run on pynput threads; the lock makes the
        # per-frame snapshot in poll() atomic (an unguarded
        # frozenset(self._pressed) can raise 'set changed size during
        # iteration', and the scroll read-then-zero would drop events).
        self._lock = threading.Lock()

        def on_move(x, y):
            self._mouse_pos = (x, y)

        def on_scroll(x, y, dx, dy):
            with self._lock:
                self._scroll += 1 if dy > 0 else -1 if dy < 0 else 0

        def on_press(key):
            char = getattr(key, "char", None)
            if char:
                with self._lock:
                    self._pressed.add(char)
                    if char == "q":
                        self._quit = True
                    if char == "p":
                        self._save = True

        def on_release(key):
            char = getattr(key, "char", None)
            if char:
                with self._lock:
                    self._pressed.discard(char)

        self._listeners = [
            mouse.Listener(on_move=on_move, on_scroll=on_scroll),
            keyboard.Listener(on_press=on_press, on_release=on_release),
        ]
        for listener in self._listeners:
            listener.start()

    def poll(self) -> InputSnapshot:
        with self._lock:
            scroll, self._scroll = self._scroll, 0
            save, self._save = self._save, False
            pressed = frozenset(self._pressed)
            quit_ = self._quit
        return InputSnapshot(
            mouse_ndc=(
                (self._mouse_pos[0] - self._centre[0]) / self._centre[0],
                (self._mouse_pos[1] - self._centre[1]) / self._centre[1],
            ),
            pressed=pressed,
            scroll=scroll,
            quit=quit_,
            save_frame=save,
        )

    def close(self):
        for listener in self._listeners:
            listener.stop()


def orbit_script(frames: int, yaw_per_frame: float = 0.02):
    """A scripted input that slowly orbits: useful for demos and smoke runs."""
    return ScriptedInput(
        [InputSnapshot(mouse_ndc=(yaw_per_frame, 0.0)) for _ in range(frames)]
    )


def _display_frame(image):
    """(N, H, W, C) → (H, W, C) for display: average the camera axis, the
    reference app's display reduction (``images.mean(dim=0)``,
    main.py:78-84) and the same semantics as :func:`io.image.write_png` —
    every sink shows what the saved PNG will contain. uint8 frames stay
    uint8 (mean promotes to float; round back)."""
    import numpy as np

    img = np.asarray(image)
    if img.ndim == 4:
        was_uint8 = img.dtype == np.uint8
        img = img.mean(axis=0)
        if was_uint8:
            img = (img + 0.5).astype(np.uint8)
    return img


@dataclass
class PNGSink:
    """Writes every Nth frame (and every save-requested frame) as PNG."""

    directory: str
    every: int = 1

    def __call__(self, frame_idx, image, session):
        if session.save_frame or frame_idx % self.every == 0:
            write_png(Path(self.directory) / f"frame_{frame_idx:05d}.png", image)


class TerminalSink:
    """Live in-terminal preview: ANSI truecolor half-block rendering.

    Dependency-free substitute for the reference's GL window
    (torchwindow/window.py:146-174): each character cell shows two vertical
    pixels via '▀' with separate foreground (top) and background (bottom)
    colors, so a 100×56 cell grid displays a 100×112 preview. Works in any
    24-bit-color terminal; NaN pixels render black.
    """

    def __init__(self, max_cols: int = 100, max_rows: int = 48, file=None):
        import sys

        self.max_cols = max_cols
        self.max_rows = max_rows  # character rows => 2·max_rows pixels
        self.file = file or sys.stdout
        self._first = True

    def __call__(self, frame_idx, image, session):
        import numpy as np

        img = _display_frame(image)  # camera mean, like write_png
        if img.dtype != np.uint8:  # floats: NaN→black, clamp, quantize
            img = np.nan_to_num(img, nan=0.0, posinf=1.0, neginf=0.0)
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        h, w = img.shape[:2]
        step = max(1, -(-w // self.max_cols), -(-h // (2 * self.max_rows)))
        img = img[::step, ::step]
        # Even row count for the top/bottom pairing.
        if img.shape[0] % 2:
            img = img[:-1]
        rgb = img
        top, bottom = rgb[0::2], rgb[1::2]
        lines = []
        for tr, br in zip(top, bottom):
            cells = [
                f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
                for t, b in zip(tr, br)
            ]
            lines.append("".join(cells) + "\x1b[0m")
        # Repaint in place after the first frame (cursor up + to column 0).
        prefix = "" if self._first else f"\x1b[{len(lines)}F"
        self._first = False
        self.file.write(prefix + "\n".join(lines) + "\n")
        self.file.flush()


class KittySink:
    """Live pixel-perfect in-terminal preview via the kitty graphics
    protocol (APC ``\\x1b_G…\\x1b\\\\`` escapes carrying base64 PNG).

    Full-resolution frames in kitty/ghostty/wezterm-class terminals —
    higher fidelity than :class:`TerminalSink`'s half-block cells, same
    zero-dependency device→host→bytes display path (SURVEY.md §2.6; the
    reference's GL window capability, torchwindow/window.py:146-174).
    Each frame deletes the previous placement and re-transmits at the
    saved cursor position; ``q=2`` suppresses terminal responses so the
    loop never blocks on reads.
    """

    CHUNK = 4096

    def __init__(self, file=None):
        import sys

        self.file = file or sys.stdout
        self._first = True

    def __call__(self, frame_idx, image, session):
        import base64

        from ray_marching_tpu.io.image import encode_png

        img = _display_frame(image)  # camera mean, like write_png
        # level 1: a live frame is drawn once — encode latency beats size
        payload = base64.standard_b64encode(encode_png(img, level=1))
        out = []
        if self._first:
            out.append("\x1b[s")  # save cursor
            self._first = False
        else:
            out.append("\x1b[u\x1b[s")  # restore (repaint in place)
            out.append("\x1b_Ga=d,d=A,q=2\x1b\\")  # delete old placements
        pos = 0
        first_chunk = True
        while pos < len(payload):
            chunk = payload[pos:pos + self.CHUNK]
            pos += self.CHUNK
            more = 1 if pos < len(payload) else 0
            ctrl = f"a=T,f=100,q=2,m={more}" if first_chunk else f"m={more}"
            first_chunk = False
            out.append(f"\x1b_G{ctrl};{chunk.decode('ascii')}\x1b\\")
        self.file.write("".join(out))
        self.file.flush()


class APNGSink:
    """Collect frames and write one looping animated PNG on close.

    Offline animation export (orbit/turntable demos) — the viewer's
    counterpart to saving a video, with no ffmpeg dependency. Frames are
    held on the host as uint8; ``run_viewer`` calls :meth:`close` when the
    loop ends.
    """

    def __init__(self, path, fps: float = 30.0):
        self.path = path
        self.fps = fps
        self.frames = []

    def __call__(self, frame_idx, image, session):
        import numpy as np

        img = _display_frame(image)  # camera mean, like write_png
        if img.dtype != np.uint8:
            img = np.nan_to_num(img, nan=0.0, posinf=1.0, neginf=0.0)
            img = (np.clip(img, 0.0, 1.0) * 255 + 0.5).astype(np.uint8)
        self.frames.append(img)

    def close(self):
        from ray_marching_tpu.io.image import write_apng

        if self.frames:
            write_apng(self.path, self.frames, fps=self.fps)


class MultiSink:
    """Fan a frame out to several sinks (e.g. terminal preview + PNGs)."""

    def __init__(self, *sinks):
        self.sinks = [s for s in sinks if s is not None]

    def __call__(self, frame_idx, image, session):
        for sink in self.sinks:
            sink(frame_idx, image, session)

    def close(self):
        for sink in self.sinks:
            if hasattr(sink, "close"):
                sink.close()


def run_viewer(renderer, input_source, sink: Callable, *,
               camera: Optional[CameraState] = None,
               session: Optional[SessionState] = None,
               control: ControlConfig = ControlConfig(),
               max_frames: Optional[int] = None,
               print_fps: bool = True,
               jit_cache_size: int = 8,
               transfer: str = "uint8",
               fetch_stride: int = 1,
               params=None,
               modes=None,
               pose_callback: Optional[Callable] = None):
    """The frame loop (reference main.py:52-88). Returns final states.

    ``params`` renders with a specific scene-parameter pytree (e.g. an
    optimized checkpoint — the optimize→view loop); default is the
    renderer's initial parameters.

    ``modes`` is the shader-mode cycle the scroll wheel walks:
    a sequence of integer modes and/or named extra lighting modes
    (render/lighting.py). Default ``range(8)`` — the reference's
    ``mode % 8`` wraparound (shader.py:204-209); pass
    ``list(range(8)) + list(lighting.EXTRA_MODES)`` to scroll through
    occlusion/shaded too.

    The per-(mode, steps, degree) jit cache is LRU-bounded
    (``jit_cache_size``): scrubbing marching_steps interactively recompiles
    but no longer accumulates compiled functions without bound.

    ``transfer='uint8'`` (default) quantizes frames to display bytes ON
    DEVICE before the device→host fetch — 4× less transfer per frame,
    which dominates interactive FPS over thin links (and is what every
    sink converts to anyway; NaN pixels map to black, matching the sinks'
    float handling). ``transfer='float32'`` fetches raw shader output.
    ``fetch_stride=k`` additionally subsamples every k-th pixel on device
    before the fetch (live-preview sessions over thin links; saved PNGs
    are then strided too).
    """
    from collections import OrderedDict

    import jax.numpy as jnp

    camera = camera or CameraState.initial(dtype=renderer.dtype)
    session = session or SessionState(marching_steps=renderer.config.marching_steps)
    params = renderer.init_params if params is None else params
    modes = tuple(range(8)) if modes is None else tuple(modes)

    @jax.jit
    def quantize(img):
        if fetch_stride > 1:
            img = img[:, ::fetch_stride, ::fetch_stride]
        img = jnp.nan_to_num(img, nan=0.0, posinf=1.0, neginf=0.0)
        return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    @jax.jit
    def stride(img):
        return img[:, ::fetch_stride, ::fetch_stride]

    def make_fn(mode, steps, degree):
        base = renderer.jitted(mode=mode, marching_steps=steps, degree=degree)
        if transfer == "uint8":
            return lambda p, q, t: quantize(base(p, q, t))
        if fetch_stride > 1:  # stride applies on device for raw fetches too
            return lambda p, q, t: stride(base(p, q, t))
        return base

    jitted_cache = OrderedDict()
    frame_idx = 0
    old_time = time.perf_counter()
    # One-frame pipeline: dispatch frame n+1 (async on device) BEFORE
    # fetching and sinking frame n, so the device renders while the host
    # transfers/encodes — the two dominant costs overlap. Costs one frame
    # of display latency (reference main.py's loop is serial, but its draw
    # was a same-GPU zero-copy blit; ours crosses a link).
    pending = None  # (frame_idx, device image, session at dispatch)

    def flush(pending):
        nonlocal old_time
        idx, dev_image, sess = pending
        sink(idx, jax.device_get(dev_image), sess)
        new_time = time.perf_counter()
        if print_fps:
            print(f"{1.0 / (new_time - old_time):.2f} frames per second")
        old_time = new_time

    while session.running and (max_frames is None or frame_idx < max_frames):
        snap = input_source.poll()
        session = session.step(snap)
        if not session.running:
            break
        camera = apply_input(camera, snap, control)
        if pose_callback is not None:
            # Observability hook: the integrated pose/session for this
            # frame, before dispatch (the web viewer's /state endpoint).
            pose_callback(frame_idx, camera, session)
        key = (modes[session.mode % len(modes)], session.marching_steps,
               session.degree)
        if key in jitted_cache:
            jitted_cache.move_to_end(key)
        else:
            jitted_cache[key] = make_fn(*key)
            while len(jitted_cache) > jit_cache_size:
                jitted_cache.popitem(last=False)
        image = jitted_cache[key](
            params, camera.orientation, camera.position
        )
        if pending is not None:
            flush(pending)
        pending = (frame_idx, image, session)
        frame_idx += 1
    if pending is not None:
        flush(pending)
    input_source.close()
    if hasattr(sink, "close"):  # finalize accumulating sinks (APNGSink)
        sink.close()
    return camera, session, frame_idx
