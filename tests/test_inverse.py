"""Inverse rendering: BASELINE config 4 — recover scene params (and pose)
from a target image; checkpoint/resume; metrics."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.io.checkpoint import load_pytree, save_pytree
from ray_marching_tpu.optim.inverse import InverseConfig, optimize
from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
from ray_marching_tpu.scene import registry

PX = 3.45e-6


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(
        px_width=48, px_height=32,
        focal_length=PX * 32, sensor_width=PX * 48, sensor_height=PX * 32,
        marching_steps=12,
    )
    r = Renderer(registry.make_scene("test_scene2"), cfg, dtype=jnp.float32)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    # Ground-truth: sphere radius 0.65 instead of 0.5.
    true_params = jax.tree.map(lambda x: x, r.init_params)
    true_params["c1"]["c0"]["radius"] = jnp.asarray(0.65, jnp.float32)
    target = r.render(true_params, q, t, mode=0, degree=1)
    return r, q, t, target


import jax  # noqa: E402


def test_recovers_sphere_radius(setup):
    r, q, t, target = setup
    cfg = InverseConfig(
        learning_rate=2e-2, steps=120, mode=0, degree=1,
        trainable=["c1/c0/radius"],
    )
    out = optimize(r, target, q, t, cfg)
    radius = float(out["params"]["c1"]["c0"]["radius"])
    assert abs(radius - 0.65) < 0.03, radius
    # Frozen leaves stayed put.
    np.testing.assert_array_equal(
        np.asarray(out["params"]["c1"]["c1"]["radius1"]),
        np.asarray(r.init_params["c1"]["c1"]["radius1"]),
    )
    assert out["losses"][-1] < out["losses"][0]


def test_quaternion_leaves_stay_unit(setup):
    r, q, t, target = setup
    scene = registry.make_scene("test_scene")
    cfg_r = RenderConfig(
        px_width=48, px_height=32,
        focal_length=PX * 32, sensor_width=PX * 48, sensor_height=PX * 32,
        marching_steps=12,
    )
    r2 = Renderer(scene, cfg_r, dtype=jnp.float32)
    q2 = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
    t2 = jnp.asarray([[0.0, 0.3, -2.0]], jnp.float32)
    target2 = r2.render(r2.init_params, q2, t2, mode=0, degree=1)
    cfg = InverseConfig(learning_rate=1e-2, steps=5, trainable=["orientation"])
    out = optimize(r2, target2, q2, t2, cfg)
    for key in ("c0", "c1", "c3"):
        norm = np.linalg.norm(np.asarray(out["params"][key]["orientation"]))
        np.testing.assert_allclose(norm, 1.0, rtol=1e-5)


def test_pose_optimization_moves_pose(setup):
    r, q, t, target = setup
    q_bad = jnp.asarray([[0.02, 0.0, 0.9998, 0.0]], jnp.float32)
    q_bad = q_bad / jnp.linalg.norm(q_bad)
    cfg = InverseConfig(
        learning_rate=5e-3, steps=30, trainable=[], optimize_pose=True
    )
    out = optimize(r, target, q_bad, t, cfg)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["orientation"])), 1.0, rtol=1e-5
    )
    assert out["losses"][-1] < out["losses"][0]


def test_checkpoint_resume_and_metrics(setup, tmp_path):
    r, q, t, target = setup
    ckpt_dir = tmp_path / "ckpts"
    metrics = tmp_path / "metrics.jsonl"
    cfg = InverseConfig(
        learning_rate=2e-2, steps=20, trainable=["c1/c0/radius"],
        checkpoint_every=10, checkpoint_dir=str(ckpt_dir),
        metrics_path=str(metrics),
    )
    out1 = optimize(r, target, q, t, cfg)
    assert (ckpt_dir / "ckpt_000010.npz").exists()
    assert (ckpt_dir / "ckpt_000020.npz").exists()
    lines = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert len(lines) == 20 and {"step", "loss", "grad_norm", "wall_s"} <= set(lines[0])

    # Resume from step 10 and land at an equivalent result.
    cfg2 = InverseConfig(
        learning_rate=2e-2, steps=20, trainable=["c1/c0/radius"],
    )
    out2 = optimize(
        r, target, q, t, cfg2, resume_from=str(ckpt_dir / "ckpt_000010.npz")
    )
    assert out2["steps_run"] == 10
    np.testing.assert_allclose(
        float(out2["params"]["c1"]["c0"]["radius"]),
        float(out1["params"]["c1"]["c0"]["radius"]),
        rtol=1e-5,
    )


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.asarray([1.0, 2.0]), "b": {"c": jnp.asarray(3.0)}}
    p = save_pytree(tmp_path / "x.npz", tree, extra={"step": 7})
    restored, extra = load_pytree(p, tree, with_extra=True)
    np.testing.assert_array_equal(np.asarray(restored["a"]), [1.0, 2.0])
    assert int(extra["step"]) == 7


def test_optimize_with_fast_renderer(setup):
    """The inverse loop is renderer-agnostic: the plane-native fast path
    (fused kernels + fused backward) recovers the same parameter."""
    from ray_marching_tpu.render.fast import FastRenderer

    cfg = RenderConfig(
        px_width=48, px_height=32,
        focal_length=PX * 32, sensor_width=PX * 48, sensor_height=PX * 32,
        marching_steps=12,
    )
    f = FastRenderer(registry.make_scene("test_scene2"), cfg,
                     dtype=jnp.float32, interpret=True)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    true_params = jax.tree.map(lambda x: x, f.init_params)
    true_params["c1"]["c0"]["radius"] = jnp.asarray(0.65, jnp.float32)
    target = f.render(true_params, q, t, mode=0, degree=1)
    # lr 1e-2 / 400 steps CONVERGES (loss ~3e-9, radius error ~1e-4);
    # the old lr 2e-2 / 120 oscillated on a ~9e-3 plateau whose iterate
    # was ulp-sensitive — the round-5 kernel-side union pruning shifted
    # f32 gradients by ~1e-6 relative and moved it across the threshold.
    # Converged settings make the pin chaos-proof.
    out = optimize(
        f, target, q, t,
        InverseConfig(learning_rate=1e-2, steps=400, mode=0, degree=1,
                      trainable=["c1/c0/radius"]),
    )
    assert abs(float(out["params"]["c1"]["c0"]["radius"]) - 0.65) < 0.03


def test_adamw_freezes_masked_leaves_and_pose(setup):
    """adamw's decoupled weight decay contributes updates from params even
    when gradients are zeroed — round 1 let masked leaves and the frozen
    pose drift every step. Updates are now masked too."""
    r, q, t, target = setup
    cfg = InverseConfig(
        learning_rate=2e-2, steps=5, mode=0, degree=1,
        optimizer="adamw", trainable=["c1/c0/radius"], optimize_pose=False,
    )
    out = optimize(r, target, q, t, cfg)
    # The one trainable leaf moved...
    assert float(out["params"]["c1"]["c0"]["radius"]) != float(
        r.init_params["c1"]["c0"]["radius"]
    )
    # ...every other leaf and the pose did not (bitwise).
    from ray_marching_tpu.scene.graph import param_paths

    before = param_paths(r.init_params)
    after = param_paths(out["params"])
    for k in before:
        if k == "c1/c0/radius":
            continue
        np.testing.assert_array_equal(
            np.asarray(before[k]), np.asarray(after[k]), err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(out["orientation"]), np.asarray(q))
    np.testing.assert_array_equal(np.asarray(out["translation"]), np.asarray(t))


def test_optimize_fast_renderer_silhouette(setup):
    """Silhouette-aware inverse rendering end-to-end on the fused-kernel
    path: optimize() + FastRenderer.render_with_alpha recover a box
    half-side that the plain pixel loss cannot observe (see
    tests/test_silhouette.py for the stall analysis)."""
    from ray_marching_tpu.render.fast import FastRenderer
    from ray_marching_tpu.render.silhouette import composite
    from ray_marching_tpu.scene.graph import Box

    beta = 0.1
    cfg = RenderConfig(
        num_cameras=2, px_width=48, px_height=48,
        focal_length=PX * 48, sensor_width=PX * 48, sensor_height=PX * 48,
        marching_steps=24, normals_eps=1e-3, silhouette_beta=beta,
    )
    f = FastRenderer(Box(halfsides=(0.3, 0.3, 0.2)), cfg,
                     dtype=jnp.float64, grid_dtype=np.float64,
                     interpret=True)
    s2 = 0.5 ** 0.5
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0], [s2, 0.0, -s2, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.0, 2.0], [2.0, 0.0, 0.0]], jnp.float64)
    true_params = {"halfsides": jnp.asarray([0.5, 0.5, 0.2], jnp.float64)}
    img_t, a_t = f.render_with_alpha(true_params, q, t, mode=0, beta=beta)
    out = optimize(
        f, composite(img_t, a_t), q, t,
        InverseConfig(learning_rate=2e-2, steps=150, mode=0,
                      trainable=["halfsides"], silhouette_beta=beta),
        target_alpha=a_t,
    )
    # This landscape is chaotic (a 1e-10 init perturbation moves the
    # *modular* endpoint by ~0.09), so assert robust convergence — large
    # loss reduction and every half-side most of the way to the target —
    # not a tight endpoint. Plain pixel loss moves nothing at all here.
    h = np.asarray(out["params"]["halfsides"])
    np.testing.assert_allclose(h, [0.5, 0.5, 0.2], atol=0.1)
    assert out["losses"][-1] < 0.25 * out["losses"][0]
    assert h[0] > 0.42 and h[1] > 0.42  # grew from 0.3 toward 0.5


def test_target_alpha_without_beta_raises(small_renderer=None):
    """Mask supervision must not be silently dropped: target_alpha with
    the default silhouette_beta=0 is a config error."""
    import pytest

    from ray_marching_tpu.optim.inverse import InverseConfig, optimize
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
    from ray_marching_tpu.scene import registry

    cfg = RenderConfig(px_width=16, px_height=8, marching_steps=4)
    r = Renderer(registry.make_scene("single_sphere"), cfg)
    q, t = jnp.asarray([[1.0, 0, 0, 0]]), jnp.asarray([[0.0, 0, 2]])
    target = jnp.zeros((1, 8, 16, 3))
    with pytest.raises(ValueError, match="silhouette_beta"):
        optimize(r, target, q, t, target_alpha=jnp.zeros((1, 8, 16, 1)),
                 config=InverseConfig(steps=1))


def test_checkpoint_path_suffix_and_shape_check(tmp_path):
    """save_pytree returns the file np.savez actually wrote (suffix
    appended); load_pytree rejects shape-mismatched leaves with the
    offending path instead of deferring to an opaque XLA error."""
    import pytest

    from ray_marching_tpu.io.checkpoint import load_pytree, save_pytree

    tree = {"a": np.ones((2, 3)), "b": np.zeros((4,))}
    p = save_pytree(tmp_path / "ckpt_final", tree)
    assert p.name == "ckpt_final.npz" and p.exists()
    assert load_pytree(p, tree)["a"].shape == (2, 3)
    bad_template = {"a": np.ones((2, 3)), "b": np.zeros((5,))}
    with pytest.raises(ValueError, match=r"\['b'\].*stored \(4,\)"):
        load_pytree(p, bad_template)


def test_orbax_checkpoint_resume(tmp_path):
    """The orbax backend (multihost-safe checkpointing, SURVEY.md §5)
    roundtrips (state, opt_state) + step counter and resumes where the
    npz backend would — same template-supplies-structure contract; shape
    mismatches fail fast with the offending path."""
    import pytest

    from ray_marching_tpu.io.checkpoint import (
        load_pytree_orbax,
        save_pytree_orbax,
    )
    from ray_marching_tpu.optim.inverse import InverseConfig, optimize
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
    from ray_marching_tpu.scene import registry

    cfg = RenderConfig(px_width=24, px_height=16, marching_steps=4)
    r = Renderer(registry.make_scene("single_sphere"), cfg)
    q, t = jnp.asarray([[1.0, 0, 0, 0]]), jnp.asarray([[0.0, 0, 2]])
    target = r.render(r.init_params, q, t, mode=0) * 0.8
    icfg = InverseConfig(steps=4, checkpoint_every=2,
                         checkpoint_dir=str(tmp_path / "ck"),
                         checkpoint_backend="orbax")
    out = optimize(r, target, q, t, config=icfg)
    ckpts = sorted((tmp_path / "ck").iterdir())
    assert [c.name for c in ckpts] == ["ckpt_000002", "ckpt_000004"]
    out2 = optimize(r, target, q, t, config=icfg,
                    resume_from=ckpts[-1])
    assert out2["steps_run"] == 0  # already past config.steps
    # shape-mismatch template fails fast
    bad = {"a": np.ones((3,))}
    p = save_pytree_orbax(tmp_path / "solo", bad)
    with pytest.raises(ValueError, match="shapes"):
        load_pytree_orbax(p, {"a": np.ones((4,))})
