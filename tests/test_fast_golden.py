"""Direct FastRenderer-vs-reference golden pin.

Until round 4, fast-path parity to the PyTorch reference was transitive
only: tests/test_fast.py pins fast↔modular at small sizes, and
tests/test_golden_parity.py pins modular↔reference — a drift that cancels
in one comparison could hide. This suite runs the FastRenderer (f64,
interpret-mode Pallas kernels) STRAIGHT against the reference-produced
composite_512 fixture (tools/gen_golden.py ran the actual reference,
rendering/shader.py formulas, in float64), images and gradients both.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.pipeline import RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import param_paths

GOLDEN = Path(__file__).parent / "golden" / "composite_512.npz"
PX_SIZE = 3.45e-6


@pytest.fixture(scope="module")
def fixture():
    g = np.load(GOLDEN)
    w, h = int(g["meta_width"]), int(g["meta_height"])
    cfg = RenderConfig(
        px_width=w,
        px_height=h,
        focal_length=PX_SIZE * h,
        sensor_width=PX_SIZE * w,
        sensor_height=PX_SIZE * h,
        marching_steps=int(g["meta_steps"]),
        normals_eps=float(g["meta_normals_eps"]),
    )
    scene = registry.make_scene(str(g["meta_scene"]))
    r = FastRenderer(scene, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    orientation = jnp.asarray(g["meta_orientation"], jnp.float64)[None]
    translation = jnp.asarray(g["meta_translation"], jnp.float64)[None]
    return g, r, orientation, translation


@pytest.mark.parametrize("mode", range(8))
def test_fast_image_golden(fixture, mode):
    g, r, orientation, translation = fixture
    assert mode in set(g["meta_image_modes"].tolist())
    degree = int(g["meta_degree"])
    image = np.asarray(
        r.render(r.init_params, orientation, translation, mode=mode,
                 degree=degree)
    )
    want = g[f"image_{mode}"]
    mask = np.broadcast_to(g["stable_mask"], want.shape)
    np.testing.assert_allclose(
        image[mask], want[mask], rtol=1e-9, atol=1e-11, equal_nan=True,
        err_msg=f"fast composite_512 mode={mode}",
    )


# Mode 5 (laplacian) is excluded from value comparison: the REFERENCE's
# gradient for this fixture is all-NaN (backprop routes the global
# max|L| cotangent through a diverged-ray argmax pixel; torch propagates
# the resulting 0·inf), and the modular path reproduces that NaN
# faithfully (tests/test_golden_parity.py, equal_nan). The fast path's
# fused backward recomputes the march with where-select routing
# (utils.vmin/clamp semantics, CLAUDE.md pad-slot invariant) and does
# NOT manufacture the NaN — there is no finite reference value to pin,
# so test_fast_gradient_mode5_finite pins the divergence explicitly.
@pytest.mark.parametrize("mode", [0, 2, 3, 6, 7])
def test_fast_gradient_golden(fixture, mode):
    g, r, orientation, translation = fixture
    assert mode in set(g["meta_grad_modes"].tolist())
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
            np.asarray(got).reshape(want.shape), want,
            rtol=1e-7, atol=1e-9, equal_nan=True,
            err_msg=f"fast composite_512 mode={mode} param={path}",
        )
    golden_keys = {
        k.split("/", 1)[1] for k in g.files if k.startswith(f"grad_{mode}/")
    }
    assert golden_keys == set(flat)


def test_fast_gradient_mode5_finite(fixture):
    """The laplacian-mode divergence, pinned: the reference gradient is
    all-NaN here (see the comment above test_fast_gradient_golden); the
    fast path's where-select backward stays FINITE — a deliberate
    robustness improvement, recorded so it can't drift unnoticed."""
    g, r, orientation, translation = fixture
    assert all(
        np.isnan(g[k]).all() for k in g.files if k.startswith("grad_5/")
    ), "fixture no longer all-NaN for mode 5 — re-point this pin"
    weights = jnp.asarray(g["loss_weights"], jnp.float64)

    def loss(params, q, t):
        image = r.render(params, q, t, mode=5, degree=int(g["meta_degree"]))
        return jnp.sum(image * weights)

    grads = jax.grad(loss)(r.init_params, orientation, translation)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
