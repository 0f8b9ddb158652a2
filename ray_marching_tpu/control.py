"""Camera control: Lie-algebra input integration as pure state transitions.

The reference's EventAggregator (control.py:18-176) mixes pynput listener
threads, pandas CSV parsing, and pose math into one mutable nn.Module, with
a tolerated data race between listener and render threads (SURVEY.md §5).
Here the same semantics are factored into pure functions over immutable
state, with a single-writer snapshot model: an input backend (interactive
or scripted) produces :class:`InputSnapshot`s; :func:`apply_input` folds a
snapshot into :class:`CameraState`.

Pose update semantics (reference control.py:114-165):
* mouse NDC offset → rotation Lie-algebra components via pad-z + [1,0,2]
  permutation: (dy, dx, 0) over the (YZ, ZX, XY) bivector basis;
* pressed keys sum their bound translation (XYZ) and rotation (YZ, ZX, XY)
  generators;
* ``position += R(q)·(Δt · trans_sens)`` (camera-frame translation),
  ``q ← normalize(q ⊗ to_versor(Δr · rot_sens))``;
* scroll cycles shader mode; i/o change degree, m/n marching steps,
  p saves a frame, q quits (reference control.py:50-70).

Key bindings are the reference's data/key_bindings.csv semantics
(w/s = ±Z, d/a = ±X, e/x = ±Y, r = +0.5·XY roll); a CSV loader compatible
with that format is provided (no pandas).
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field, replace
from pathlib import Path
from typing import Dict, FrozenSet, Tuple

import jax
import jax.numpy as jnp

from ray_marching_tpu import quat

# key -> ((X, Y, Z), (YZ, ZX, XY)) generator components.
Binding = Tuple[Tuple[float, float, float], Tuple[float, float, float]]

DEFAULT_KEY_BINDINGS: Dict[str, Binding] = {
    "d": ((1.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
    "a": ((-1.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
    "e": ((0.0, 1.0, 0.0), (0.0, 0.0, 0.0)),
    "x": ((0.0, -1.0, 0.0), (0.0, 0.0, 0.0)),
    "w": ((0.0, 0.0, 1.0), (0.0, 0.0, 0.0)),
    "s": ((0.0, 0.0, -1.0), (0.0, 0.0, 0.0)),
    "r": ((0.0, 0.0, 0.0), (0.0, 0.0, 0.5)),
}


def load_key_bindings(path) -> Dict[str, Binding]:
    """Load a reference-format key_bindings.csv
    (columns: key, X, Y, Z, YZ, ZX, XY)."""
    out: Dict[str, Binding] = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            out[row["key"]] = (
                (float(row["X"]), float(row["Y"]), float(row["Z"])),
                (float(row["YZ"]), float(row["ZX"]), float(row["XY"])),
            )
    return out


@dataclass(frozen=True)
class ControlConfig:
    translation_sensitivity: float = 0.1
    rotation_sensitivity: float = 0.25
    bindings: Dict[str, Binding] = field(
        default_factory=lambda: dict(DEFAULT_KEY_BINDINGS)
    )


@dataclass(frozen=True)
class CameraState:
    """Immutable camera pose: (N, 3) position, (N, 4) unit quaternion."""

    position: jnp.ndarray
    orientation: jnp.ndarray

    @staticmethod
    def initial(position=(0.0, 0.0, 1.0), orientation=(1.0, 0.0, 0.0, 0.0),
                num_cameras: int = 1, dtype=jnp.float32) -> "CameraState":
        return CameraState(
            position=jnp.tile(jnp.asarray([position], dtype), (num_cameras, 1)),
            orientation=jnp.tile(jnp.asarray([orientation], dtype), (num_cameras, 1)),
        )


@dataclass(frozen=True)
class InputSnapshot:
    """One frame of input, produced by a single writer."""

    mouse_ndc: Tuple[float, float] = (0.0, 0.0)
    pressed: FrozenSet[str] = frozenset()
    scroll: int = 0
    quit: bool = False
    save_frame: bool = False


@dataclass(frozen=True)
class SessionState:
    """Non-pose interactive state (reference control.py:38-70)."""

    mode: int = 0
    degree: int = 2
    marching_steps: int = 32
    running: bool = True
    save_frame: bool = False

    def step(self, snap: InputSnapshot) -> "SessionState":
        mode = self.mode + snap.scroll
        # Clamped at 1 like marching_steps (deviation from the unclamped
        # reference counters, control.py:61-68: degree <= 0 renders a
        # constant colour with a recompile per decrement).
        degree = max(
            1, self.degree + ("i" in snap.pressed) - ("o" in snap.pressed)
        )
        steps = max(
            1, self.marching_steps + ("m" in snap.pressed) - ("n" in snap.pressed)
        )
        return replace(
            self,
            mode=mode,
            degree=degree,
            marching_steps=steps,
            running=self.running and not snap.quit,
            save_frame=snap.save_frame,
        )


def input_components(snap: InputSnapshot, cfg: ControlConfig):
    """Fold a snapshot into (translation, rotation) Lie-algebra components.

    Mouse: (dx, dy) NDC → pad z=0 → permute [1, 0, 2] → (dy, dx, 0) on the
    (YZ, ZX, XY) basis (reference control.py:135-136). Keys: sum of bound
    generators (control.py:139-147).
    """
    dx, dy = snap.mouse_ndc
    rot = [dy, dx, 0.0]
    trans = [0.0, 0.0, 0.0]
    for key in snap.pressed:
        if key in cfg.bindings:
            t, r = cfg.bindings[key]
            trans = [a + b for a, b in zip(trans, t)]
            rot = [a + b for a, b in zip(rot, r)]
    return tuple(trans), tuple(rot)


@jax.jit
def _integrate(position, orientation, translation_input, rotation_input):
    """The device part of one pose step — jitted so the interactive frame
    loop never dispatches eager array ops (CLAUDE.md: eager dispatch
    against the TPU tunnel hangs; the host part of apply_input is pure
    Python over the snapshot)."""
    new_position = (
        quat.rotation(
            jnp.broadcast_to(translation_input, position.shape), orientation
        )
        + position
    )
    new_orientation = quat.normalize(
        quat.multiply(
            orientation,
            jnp.broadcast_to(quat.to_versor(rotation_input), orientation.shape),
        )
    )
    return new_position, new_orientation


def apply_input(state: CameraState, snap: InputSnapshot,
                cfg: ControlConfig = ControlConfig()) -> CameraState:
    """One pose-integration step (reference control.py:150-165)."""
    trans, rot = input_components(snap, cfg)
    dtype = state.position.dtype
    s_t, s_r = cfg.translation_sensitivity, cfg.rotation_sensitivity
    translation_input = jnp.asarray([[v * s_t for v in trans]], dtype)
    rotation_input = jnp.asarray([[v * s_r for v in rot]], dtype)
    position, orientation = _integrate(
        state.position, state.orientation, translation_input, rotation_input
    )
    return CameraState(position=position, orientation=orientation)
