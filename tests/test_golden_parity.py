"""Golden parity: pixel- and gradient-exact agreement with the PyTorch reference.

Fixtures under tests/golden/ were produced by tools/gen_golden.py running the
*actual* reference implementation in float64 (see that script for the
construction-dtype and stability-mask notes). Here the JAX pipeline renders
the same configs in float64 and must match images and
pixel-loss→parameter gradients to ~1e-9 on the stable-pixel set.

Pixels whose rays miss the scene march to astronomical distances where both
frameworks produce rounding chaos; those are excluded via the fixture's
stability mask, and modes whose global normalizations are dominated by such
pixels are excluded per-fixture (meta_image_modes / meta_grad_modes).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# BASELINE-scale f64 renders + gradient pins: the slow tier. Run the full
# suite (default) when touching math/shaders/marcher; iterate with
# `-m "not slow"`.
pytestmark = pytest.mark.slow

from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import param_paths

GOLDEN_DIR = Path(__file__).parent / "golden"
FIXTURES = sorted(p.stem for p in GOLDEN_DIR.glob("*.npz"))

PX_SIZE = 3.45e-6


def load(name):
    return np.load(GOLDEN_DIR / f"{name}.npz")


def build_renderer(g):
    w = int(g["meta_width"])
    h = int(g["meta_height"])
    cfg = RenderConfig(
        px_width=w,
        px_height=h,
        focal_length=PX_SIZE * h,
        sensor_width=PX_SIZE * w,
        sensor_height=PX_SIZE * h,
        marching_steps=int(g["meta_steps"]),
        normals_eps=float(g["meta_normals_eps"]),
        reflection_bounces=(
            int(g["meta_reflection_bounces"])
            if "meta_reflection_bounces" in g.files else 0
        ),
    )
    scene = registry.make_scene(str(g["meta_scene"]))
    return Renderer(scene, cfg, dtype=jnp.float64, grid_dtype=np.float64)


@pytest.fixture(scope="module", params=FIXTURES)
def fixture(request):
    g = load(request.param)
    r = build_renderer(g)
    orientation = jnp.asarray(g["meta_orientation"], jnp.float64)[None]
    translation = jnp.asarray(g["meta_translation"], jnp.float64)[None]
    return request.param, g, r, orientation, translation


@pytest.mark.parametrize("mode", range(8))
def test_image_parity(fixture, mode):
    name, g, r, orientation, translation = fixture
    if mode not in set(g["meta_image_modes"].tolist()):
        pytest.skip(f"mode {mode} image not comparable for {name} (chaotic pixels)")
    degree = int(g["meta_degree"])
    image = np.asarray(
        r.render(r.init_params, orientation, translation, mode=mode, degree=degree)
    )
    want = g[f"image_{mode}"]
    mask = np.broadcast_to(g["stable_mask"], want.shape)
    # f32-stored fixtures (1024²; size-bounded) cap the comparison at the
    # storage round-off; the underlying math is f64 on both sides.
    rtol, atol = (1e-6, 1e-8) if want.dtype == np.float32 else (1e-9, 1e-11)
    np.testing.assert_allclose(
        image[mask],
        want[mask],
        rtol=rtol,
        atol=atol,
        equal_nan=True,
        err_msg=f"{name} mode={mode}",
    )


def test_stability_mask_agrees(fixture):
    """The framework's own marched rays reproduce the reference's stable set
    (identical convergence behavior, not just identical stable-pixel values)."""
    name, g, r, orientation, translation = fixture

    pixel_pos, frames, ray_pos, ray_dirs = r.camera.pose(orientation, translation)
    # _march applies the config's reflection bounces (bounce fixtures mask
    # on the final, post-bounce march).
    p, _ = r._march(r.init_params, ray_pos, ray_dirs, int(g["meta_steps"]))
    f = r.sdf_vec(r.init_params, p)
    ok = (jnp.abs(f) < 1e-2) & (
        jnp.linalg.norm(p, axis=-1, keepdims=True) < 10.0
    )
    got = np.asarray(ok)
    want = g["stable_mask"]
    # Boundary pixels may flip either way; require ≥99.5% agreement.
    agreement = (got == want).mean()
    assert agreement >= 0.995, f"{name}: stable-mask agreement {agreement}"


@pytest.mark.parametrize("mode", range(8))
def test_gradient_parity(fixture, mode):
    name, g, r, orientation, translation = fixture
    if mode not in set(g["meta_grad_modes"].tolist()):
        pytest.skip(f"mode {mode} grads not comparable for {name} (chaotic argmax)")
    degree = int(g["meta_degree"])
    weights = jnp.asarray(g["loss_weights"], jnp.float64)

    def loss(params, q, t):
        image = r.render(params, q, t, mode=mode, degree=degree)
        return jnp.sum(image * weights)

    grads, gq, gt = jax.grad(loss, argnums=(0, 1, 2))(
        r.init_params, orientation, translation
    )
    flat = param_paths(grads)
    flat["camera_orientation"] = gq
    flat["camera_translation"] = gt
    for path, got in flat.items():
        want = g[f"grad_{mode}/{path}"]
        np.testing.assert_allclose(
            np.asarray(got).reshape(want.shape),
            want,
            rtol=1e-7,
            atol=1e-9,
            equal_nan=True,
            err_msg=f"{name} mode={mode} param={path}",
        )
    # Every golden grad key must have been checked (no silently missing leaf).
    golden_keys = {k.split("/", 1)[1] for k in g.files if k.startswith(f"grad_{mode}/")}
    assert golden_keys == set(flat), f"param set mismatch: {golden_keys ^ set(flat)}"
