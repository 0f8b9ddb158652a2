"""Camera controller: Lie-algebra pose integration semantics."""

import numpy as np
import jax.numpy as jnp

from ray_marching_tpu.control import (
    CameraState,
    ControlConfig,
    DEFAULT_KEY_BINDINGS,
    InputSnapshot,
    SessionState,
    apply_input,
    input_components,
    load_key_bindings,
)


def test_w_key_moves_forward_camera_frame():
    state = CameraState.initial()
    out = apply_input(state, InputSnapshot(pressed=frozenset("w")))
    # Identity orientation: +Z * 0.1 sensitivity.
    np.testing.assert_allclose(np.asarray(out.position), [[0.0, 0.0, 1.1]], atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(out.orientation), [[1.0, 0.0, 0.0, 0.0]], atol=1e-7
    )


def test_translation_is_camera_frame():
    # 90° about y maps camera +z to world +x.
    s = np.sqrt(0.5)
    state = CameraState.initial(position=(0, 0, 0), orientation=(s, 0, s, 0))
    out = apply_input(state, InputSnapshot(pressed=frozenset("w")))
    np.testing.assert_allclose(np.asarray(out.position), [[0.1, 0.0, 0.0]], atol=1e-7)


def test_mouse_x_yaws_mouse_y_pitches():
    state = CameraState.initial(position=(0, 0, 0))
    out = apply_input(state, InputSnapshot(mouse_ndc=(0.2, 0.0)))
    q = np.asarray(out.orientation)[0]
    # Yaw: ZX bivector -> quaternion y component (sensitivity 0.25).
    assert abs(q[2] - 0.05) < 1e-3 and abs(q[1]) < 1e-9 and abs(q[3]) < 1e-9
    out = apply_input(state, InputSnapshot(mouse_ndc=(0.0, 0.2)))
    q = np.asarray(out.orientation)[0]
    # Pitch: YZ bivector -> quaternion x component.
    assert abs(q[1] - 0.05) < 1e-3 and abs(q[2]) < 1e-9


def test_r_key_rolls():
    state = CameraState.initial(position=(0, 0, 0))
    out = apply_input(state, InputSnapshot(pressed=frozenset("r")))
    q = np.asarray(out.orientation)[0]
    # Roll: XY bivector -> quaternion z component, 0.5 * 0.25 sensitivity.
    assert abs(q[3] - 0.125) < 1e-2 and abs(q[1]) < 1e-9 and abs(q[2]) < 1e-9


def test_orientation_stays_unit_over_many_steps():
    state = CameraState.initial()
    rng = np.random.default_rng(0)
    for _ in range(50):
        snap = InputSnapshot(
            mouse_ndc=tuple(rng.uniform(-0.5, 0.5, 2)),
            pressed=frozenset(rng.choice(list("wasdexr"), 2)),
        )
        state = apply_input(state, snap)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.orientation)), 1.0, rtol=1e-5
    )


def test_opposing_keys_cancel():
    trans, rot = input_components(
        InputSnapshot(pressed=frozenset("wa" "sd")), ControlConfig()
    )
    assert trans == (0.0, 0.0, 0.0) and rot == (0.0, 0.0, 0.0)


def test_session_state_machine():
    s = SessionState()
    s = s.step(InputSnapshot(scroll=1))
    assert s.mode == 1
    s = s.step(InputSnapshot(pressed=frozenset("i")))
    assert s.degree == 3
    s = s.step(InputSnapshot(pressed=frozenset("n")))
    assert s.marching_steps == 31
    s = s.step(InputSnapshot(quit=True))
    assert not s.running


def test_csv_loader_matches_defaults(tmp_path):
    p = tmp_path / "kb.csv"
    p.write_text(
        "key,X,Y,Z,YZ,ZX,XY\n"
        "d,1,0,0,0,0,0\ne,0,1,0,0,0,0\nw,0,0,1,0,0,0\n"
        "a,-1,0,0,0,0,0\nx,0,-1,0,0,0,0\ns,0,0,-1,0,0,0\n"
        "r,0,0,0,0,0,0.5\n"
    )
    assert load_key_bindings(p) == DEFAULT_KEY_BINDINGS


def test_degree_clamped_at_one():
    """Holding 'o' must not drive degree to 0/negative (constant-colour
    images + a recompile per decrement); clamped like marching_steps."""
    s = SessionState(degree=2)
    for _ in range(5):
        s = s.step(InputSnapshot(pressed=frozenset("o")))
    assert s.degree == 1


def test_barrier_returns_and_caches():
    """barrier() completes on a healthy (single-process) runtime and
    reuses one pmapped callable across calls (a fresh lambda per call
    would recompile every barrier)."""
    from ray_marching_tpu.parallel import multihost

    multihost.barrier(timeout_s=60)
    fn1 = multihost._barrier_fn()
    multihost.barrier(timeout_s=60)
    assert multihost._barrier_fn() is fn1
