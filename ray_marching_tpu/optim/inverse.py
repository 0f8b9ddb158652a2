"""Inverse rendering: optimize scene parameters (and camera pose) to match
a target image through pixel-loss gradients.

The reference only implies this capability (every scene quantity is an
nn.Parameter, README advertises backprop; no training script exists —
SURVEY.md §3.5). Here it is first-class: a jitted optax loop over the
differentiable pipeline with

* **parameter masking** — optimize a chosen subset of pytree paths
  (e.g. just ``c1/c0/radius`` + camera pose), freeze the rest;
* **manifold projection** — quaternion leaves are renormalized to S³ after
  every update (mirroring the controller's pose update, reference
  control.py:158-165);
* **checkpoint/resume** — params + opt state + step counter via
  :mod:`ray_marching_tpu.io.checkpoint`;
* **metrics** — JSONL per-step records (loss, grad norm, wall time).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ray_marching_tpu.io.checkpoint import (
    load_pytree,
    load_pytree_orbax,
    save_pytree,
    save_pytree_orbax,
)
from ray_marching_tpu.scene.graph import tree_map_with_path


@dataclass
class InverseConfig:
    learning_rate: float = 1e-2
    steps: int = 200
    mode: int = 0
    degree: int = 1
    optimizer: str = "adam"  # adam | sgd | adamw
    # Pytree paths to optimize (substring match); None = every leaf.
    trainable: Optional[Sequence[str]] = None
    optimize_pose: bool = False
    checkpoint_every: int = 50
    checkpoint_dir: Optional[str] = None
    # 'npz' (single-host file) or 'orbax' (atomic,
    # multihost-coordinated - required when optimizing under
    # jax.distributed on pods).
    checkpoint_backend: str = "npz"
    metrics_path: Optional[str] = None
    loss: str = "l2"  # l2 | l1
    # Silhouette-aware loss: with beta > 0 the render is composited with a
    # soft coverage mask (render/silhouette.py) against `background`, so
    # the pixel loss carries gradient signal across object silhouettes —
    # pixel-only shape/pose fits that otherwise stall converge (see
    # tests/test_silhouette.py). Requires the renderer to support
    # render_with_alpha (the modular Renderer). Pass ``target_alpha`` to
    # optimize() to additionally supervise the mask directly
    # (weight ``silhouette_weight``) — necessary when the shading itself is
    # degenerate at the silhouette (e.g. background pixels shade to the
    # background value, zeroing the composite's ∂/∂α term).
    silhouette_beta: float = 0.0
    silhouette_weight: float = 1.0
    background: float = 0.0


def _make_optimizer(cfg: InverseConfig):
    return {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
    }[cfg.optimizer](cfg.learning_rate)


def _trainable_mask(params, trainable):
    if trainable is None:
        return tree_map_with_path(lambda path, leaf: True, params)
    return tree_map_with_path(
        lambda path, leaf: any(t in path for t in trainable), params
    )


def _renormalize_quaternions(params):
    """Project every 'orientation' leaf back onto the unit sphere."""

    def fix(path, leaf):
        if path.endswith("orientation"):
            return leaf / jnp.linalg.norm(leaf, axis=-1, keepdims=True)
        return leaf

    return tree_map_with_path(fix, params)


def optimize(renderer, target, orientation, translation,
             config: InverseConfig = InverseConfig(),
             init_params=None,
             resume_from: Optional[str] = None,
             callback: Optional[Callable] = None,
             target_alpha=None):
    """Run the inverse-rendering loop.

    Args:
        renderer: a :class:`ray_marching_tpu.render.pipeline.Renderer`.
        target: (N, H, W, 3) target image.
        orientation/translation: camera pose; optimized too when
            ``config.optimize_pose``.
        init_params: starting scene params (defaults to the renderer's).
        resume_from: checkpoint path to resume from.
        callback: ``f(step, loss, state)`` called every step.

    Returns:
        dict with final ``params``, ``orientation``, ``translation``,
        ``losses`` list, and ``steps_run``.
    """
    params = renderer.init_params if init_params is None else init_params
    mask = _trainable_mask(params, config.trainable)
    optimizer = _make_optimizer(config)

    state = {
        "params": params,
        "orientation": jnp.asarray(orientation),
        "translation": jnp.asarray(translation),
    }
    opt_state = optimizer.init(state)
    start_step = 0
    if resume_from:
        load_fn = (
            load_pytree_orbax
            if config.checkpoint_backend == "orbax"
            else load_pytree
        )
        (state, opt_state), extra = load_fn(
            resume_from, (state, opt_state), with_extra=True
        )
        start_step = int(extra.get("step", 0))

    target = jnp.asarray(target, renderer.dtype)

    if target_alpha is not None:
        if config.silhouette_beta <= 0:
            # The alpha term only enters the loss on the silhouette branch;
            # silently dropping supplied mask supervision would leave the
            # user with exactly the stalling pixel-only fit the mask was
            # meant to avoid.
            raise ValueError(
                "target_alpha supplied but config.silhouette_beta is 0 — "
                "set silhouette_beta > 0 to enable the coverage loss"
            )
        target_alpha = jnp.asarray(target_alpha, renderer.dtype)

    def loss_fn(state):
        extra = 0.0
        if config.silhouette_beta > 0:
            from ray_marching_tpu.render.silhouette import composite

            image, alpha = renderer.render_with_alpha(
                state["params"], state["orientation"], state["translation"],
                mode=config.mode, degree=config.degree,
                beta=config.silhouette_beta,
            )
            image = composite(image, alpha, config.background)
            if target_alpha is not None:
                extra = config.silhouette_weight * jnp.mean(
                    (alpha - target_alpha) ** 2
                )
        else:
            image = renderer.render(
                state["params"], state["orientation"], state["translation"],
                mode=config.mode, degree=config.degree,
            )
        err = image - target
        if config.loss == "l1":
            return jnp.mean(jnp.abs(err)) + extra
        return jnp.mean(err**2) + extra

    @jax.jit
    def step_fn(state, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(state)
        # Freeze non-trainable leaves / pose.
        grads["params"] = jax.tree.map(
            lambda g, m: g if m else jnp.zeros_like(g), grads["params"], mask
        )
        if not config.optimize_pose:
            grads["orientation"] = jnp.zeros_like(grads["orientation"])
            grads["translation"] = jnp.zeros_like(grads["translation"])
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, state)
        # Zeroed *gradients* alone don't freeze under adamw: its decoupled
        # weight decay contributes updates from params regardless of the
        # gradient. Zero the computed updates for frozen leaves too.
        updates["params"] = jax.tree.map(
            lambda u, m: u if m else jnp.zeros_like(u), updates["params"], mask
        )
        if not config.optimize_pose:
            updates["orientation"] = jnp.zeros_like(updates["orientation"])
            updates["translation"] = jnp.zeros_like(updates["translation"])
        state = optax.apply_updates(state, updates)
        state["params"] = _renormalize_quaternions(state["params"])
        state["orientation"] = state["orientation"] / jnp.linalg.norm(
            state["orientation"], axis=-1, keepdims=True
        )
        return state, opt_state, loss, gnorm

    metrics_file = None
    if config.metrics_path:
        Path(config.metrics_path).parent.mkdir(parents=True, exist_ok=True)
        metrics_file = open(config.metrics_path, "a")

    losses = []
    t_start = time.perf_counter()
    try:
        for step in range(start_step, config.steps):
            state, opt_state, loss, gnorm = step_fn(state, opt_state)
            loss = float(loss)
            losses.append(loss)
            if metrics_file:
                metrics_file.write(
                    json.dumps(
                        {
                            "step": step,
                            "loss": loss,
                            "grad_norm": float(gnorm),
                            "wall_s": time.perf_counter() - t_start,
                        }
                    )
                    + "\n"
                )
                metrics_file.flush()
            if callback:
                callback(step, loss, state)
            if (
                config.checkpoint_dir
                and (step + 1) % config.checkpoint_every == 0
            ):
                if config.checkpoint_backend == "orbax":
                    save_pytree_orbax(
                        Path(config.checkpoint_dir)
                        / f"ckpt_{step + 1:06d}",
                        (state, opt_state),
                        extra={"step": step + 1},
                    )
                else:
                    save_pytree(
                        Path(config.checkpoint_dir)
                        / f"ckpt_{step + 1:06d}.npz",
                        (state, opt_state),
                        extra={"step": step + 1},
                    )
    finally:
        if metrics_file:
            metrics_file.close()

    return {
        "params": state["params"],
        "orientation": state["orientation"],
        "translation": state["translation"],
        "losses": losses,
        "steps_run": len(losses),
    }
