"""Config-fuzz: FastRenderer vs modular Renderer across awkward configs.

The historical bug class in the fused kernels is geometry bookkeeping at
seams — row padding when H·W/128 is odd, multi-camera stacks whose blocks
don't divide the kernel tile, tau freeze masks, bounce re-marches — not
the math itself (golden-pinned). This suite sweeps those corners jointly
under a fixed seed and pins the fast path to the modular one (itself
golden-pinned to the PyTorch reference), images and gradients. Chaos rule
(CLAUDE.md): diverged rays are compared with equal_nan and a tolerance
band, never bit-exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.render.fast import FastRenderer
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry
from ray_marching_tpu.scene.graph import param_paths

PX = 3.45e-6

# (w, h, steps, tau, cameras, bounces, mode) — hand-laid to cover: odd
# resolutions (plane-row padding), rows crossing non-multiples of the
# 128-row kernel tile with multi-camera stacks (the round-1 ADVICE bug),
# tau freeze masks with and without bounces, and every shader family
# (plain, globally-normalized, cmap-gathered).
CASES = [
    (37, 23, 7, 0.0, 1, 0, 0),      # odd res, odd steps
    (51, 33, 16, 1e-3, 1, 0, 1),    # odd res + tau (global min/max shader)
    (96, 24, 12, 0.0, 3, 0, 4),     # 3 cameras x 18 rows = 54: pad to tile
    (64, 48, 16, 0.0, 2, 1, 0),     # multi-camera + bounce
    (40, 26, 19, 1e-3, 2, 0, 7),    # tau + 2 cameras + cmap gather
    (80, 60, 16, 0.0, 1, 2, 5),     # two bounces, laplacian normalization
]


def build(w, h, steps, tau, cameras, bounces):
    cfg = RenderConfig(
        px_width=w, px_height=h,
        focal_length=PX * h, sensor_width=PX * w, sensor_height=PX * h,
        marching_steps=steps, tau=tau, num_cameras=cameras,
        reflection_bounces=bounces,
    )
    node = registry.make_scene("test_scene2")
    r = Renderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    f = FastRenderer(node, cfg, dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    rng = np.random.default_rng(w * h + steps)
    q = rng.standard_normal((cameras, 4)) * 0.2 + np.array([0, 0, 1.0, 0])
    q = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
    t = jnp.asarray(rng.uniform(-0.3, 0.3, (cameras, 3)) + [0, 0.2, 2.2])
    return r, f, q, t


@pytest.mark.parametrize("w,h,steps,tau,cameras,bounces,mode", CASES)
def test_image_parity(w, h, steps, tau, cameras, bounces, mode):
    r, f, q, t = build(w, h, steps, tau, cameras, bounces)
    a = np.asarray(r.render(r.init_params, q, t, mode=mode, degree=2))
    b = np.asarray(f.render(f.init_params, q, t, mode=mode, degree=2))
    assert b.shape == (cameras, h, w, 3)
    close = np.isclose(a, b, rtol=1e-9, atol=1e-11, equal_nan=True)
    if mode in (6, 7):
        # cmap gather: a 1-ulp angle difference can flip a bucket.
        assert (~close).mean() < 0.005, f"mode {mode}: {(~close).mean()}"
    else:
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11,
                                   equal_nan=True)


@pytest.mark.parametrize(
    "w,h,steps,tau,cameras,bounces,mode",
    [CASES[1], CASES[2], CASES[4]],
)
@pytest.mark.slow
def test_gradient_parity(w, h, steps, tau, cameras, bounces, mode):
    """Scene-parameter gradients through the fused backward across the
    same seams (padding, multi-camera tiles, tau masks). Mode 0 is used
    for the loss regardless of the image-parity mode: cmap-gather modes
    route gradients through argmin/argmax buckets too chaotic for
    cross-implementation comparison."""
    r, f, q, t = build(w, h, steps, tau, cameras, bounces)
    rng = np.random.default_rng(0)
    wgt = jnp.asarray(rng.standard_normal((cameras, h, w, 3)))

    def loss(render_fn, params):
        img = render_fn(params, q, t, mode=0, degree=2)
        return jnp.sum(jnp.nan_to_num(img, nan=0.0) * wgt)

    g1 = param_paths(jax.grad(lambda p: loss(r.render, p))(r.init_params))
    g2 = param_paths(jax.grad(lambda p: loss(f.render, p))(f.init_params))
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-6, atol=1e-10,
            err_msg=k,
        )
