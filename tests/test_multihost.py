"""Multihost scaffolding (single-process paths) and NaN-sanitizer tier."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.parallel import multihost


def test_initialize_noop_without_config(monkeypatch):
    for var in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False


def test_host0_helpers(capsys):
    assert multihost.is_host0()
    multihost.host0_print("hello")
    assert "hello" in capsys.readouterr().out


def test_global_mesh_single_process():
    mesh = multihost.make_global_mesh()
    assert mesh.axis_names == ("host", "chip")
    assert mesh.devices.shape == (1, len(jax.devices()))


def test_barrier_completes():
    multihost.barrier()


def test_render_is_nan_free_under_debug_nans():
    """Sanitizer tier (SURVEY.md §5): the lambertian render of the closed
    room scene must be NaN-free even with jax_debug_nans tripping on any
    NaN-producing primitive."""
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
    from ray_marching_tpu.scene import registry

    px = 3.45e-6
    cfg = RenderConfig(
        px_width=32, px_height=16,
        focal_length=px * 16, sensor_width=px * 32, sensor_height=px * 16,
        marching_steps=8,
    )
    r = Renderer(registry.make_scene("test_scene2"), cfg, dtype=jnp.float32)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.2, 2.0]], jnp.float32)
    with jax.debug_nans(True):
        img = r.render(r.init_params, q, t, mode=0, degree=1)
    assert np.isfinite(np.asarray(img)).all()
