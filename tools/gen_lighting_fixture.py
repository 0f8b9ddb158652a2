"""Freeze a regression fixture for the named lighting modes.

The extra modes ("occlusion"/"shaded", render/lighting.py) are capability
extensions with NO reference counterpart (the reference shader stack,
rendering/shader.py, has no light source), so — unlike tests/golden/*.npz,
which come from the actual reference via tools/gen_golden.py — this fixture
is SELF-GENERATED: a float64 render of both modes by the modular pipeline,
frozen so the two renderers cannot silently drift *together* (the
fast↔modular parity tests in tests/test_lighting.py only pin them against
each other).

Regenerate ONLY on an intentional change to the lighting math:

    python tools/gen_lighting_fixture.py
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

# Mirrors tests/test_lighting.py's renderer configuration so the frozen
# pin exercises the same code paths as the parity tests. Scene/pose chosen
# for REAL occlusion variation (test_scene's onion-box corner: occlusion
# spans [0.75, 1.0] here; test_scene2's smooth convex hits barely vary).
PX = 3.45e-6
WIDTH, HEIGHT, STEPS = 64, 48, 24
SCENE = "test_scene"
POSE_Q = (0.0, 0.0, 1.0, 0.0)
POSE_T = (0.0, 0.2, 2.0)


def main():
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
    from ray_marching_tpu.scene import registry

    cfg = RenderConfig(
        px_width=WIDTH,
        px_height=HEIGHT,
        focal_length=PX * HEIGHT,
        sensor_width=PX * WIDTH,
        sensor_height=PX * HEIGHT,
        marching_steps=STEPS,
    )
    scene = registry.make_scene(SCENE)
    r = Renderer(scene, cfg, dtype=jnp.float64, grid_dtype=np.float64)
    q = jnp.asarray([POSE_Q], jnp.float64)
    t = jnp.asarray([POSE_T], jnp.float64)
    payload = {
        "pose_q": np.asarray(q),
        "pose_t": np.asarray(t),
        "width": WIDTH,
        "height": HEIGHT,
        "steps": STEPS,
        "px_size": PX,
    }
    for name in ("occlusion", "shaded"):
        img = r.jitted(mode=name)(r.init_params, q, t)
        payload[name] = np.asarray(img)
        print(f"{name}: mean={payload[name].mean():.6f} "
              f"finite={np.isfinite(payload[name]).all()}")
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "lighting_extra.npz", **payload)
    print(f"wrote {OUT / 'lighting_extra.npz'}")


if __name__ == "__main__":
    main()
