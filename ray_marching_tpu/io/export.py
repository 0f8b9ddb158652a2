"""AOT export: compile-once, deploy-anywhere render artifacts.

The production-serving path of the framework. ``export_render`` lowers a
configured renderer to serialized StableHLO (``jax.export``) and bundles it
with its scene parameters and metadata into a single ``.rmx`` zip artifact.
``load_render`` restores a callable ``(params, orientation, translation) ->
image`` in a process that needs no scene graph, no Python CSG compilation,
and no retracing — the server-side dependency surface is jax + this module.

The reference has no deployment story at all (a hardcoded interactive
``main.py``, reference main.py:19-88); this is a capability extension the
TPU framework needs for serving, not a parity item.

Artifacts record the lowering platforms; by default the current backend,
or pass ``platforms=("cpu", "tpu")`` to lower for both (the modular
pipeline is pure XLA so cross-platform lowering works; the fused-Pallas
fast path lowers only for the platform it was built for).
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path

import numpy as np

_HLO_NAME = "render.stablehlo"
_META_NAME = "meta.json"
_PARAMS_NAME = "params.npz"
_FORMAT_VERSION = 1


def _flatten_params(tree):
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def export_render(renderer, path, *, mode: int = 0, degree: int = 1,
                  marching_steps=None, platforms=None, params=None) -> Path:
    """Export one shader mode of a renderer as a serving artifact.

    The exported function has the exact signature of
    ``renderer.jitted(...)``: ``(params, orientation, translation) ->
    (N, H, W, 3)`` with pose shapes fixed at export time. Scene parameters
    (``params``, default the renderer's initial pytree — pass an optimized
    checkpoint to bake it in) ride along in the artifact (still a runtime
    input — a server can hot-swap optimized parameters without
    re-exporting).
    """
    import jax
    from jax import export as jexport

    steps = marching_steps or renderer.config.marching_steps
    fn = renderer.jitted(mode=mode, marching_steps=steps, degree=degree)
    q, t = renderer.default_pose()
    params = renderer.init_params if params is None else params

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(params, q, t)

    meta = {
        "format_version": _FORMAT_VERSION,
        "mode": mode,
        "degree": degree,
        "marching_steps": steps,
        "platforms": list(exported.platforms),
        "num_cameras": renderer.config.num_cameras,
        "px_width": renderer.config.px_width,
        "px_height": renderer.config.px_height,
        "dtype": np.dtype(renderer.dtype).name,
    }
    leaves, _ = _flatten_params(params)
    buf = io.BytesIO()
    np.savez(buf, **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_HLO_NAME, exported.serialize())
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
        zf.writestr(_PARAMS_NAME, buf.getvalue())
    return path


def load_render(path):
    """Load a ``.rmx`` artifact: returns ``(render_fn, params, meta)``.

    ``render_fn(params, orientation, translation)`` runs the exported
    computation (first call compiles the StableHLO — no Python tracing;
    with the persistent compilation cache enabled even that is a cache
    hit). ``params`` are the bundled scene parameters as a flat-leaf list
    in the exported calling convention — pass them straight through, or
    substitute same-structure updated leaves (e.g. from ``optimize``).
    """
    from jax import export as jexport

    with zipfile.ZipFile(path) as zf:
        exported = jexport.deserialize(zf.read(_HLO_NAME))
        meta = json.loads(zf.read(_META_NAME))
        with np.load(io.BytesIO(zf.read(_PARAMS_NAME))) as z:
            leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]

    in_tree = exported.in_tree
    # The exported in_tree is ((params, q, t), {}) — rebuild the params
    # pytree from the bundled leaves using the recorded structure.
    params_treedef = in_tree.children()[0].children()[0]
    import jax

    params = jax.tree.unflatten(params_treedef, leaves)

    def render_fn(params, orientation, translation):
        return exported.call(params, orientation, translation)

    return render_fn, params, meta


# --- multi-chip readiness kit -------------------------------------------------
#
# AOT export of the SHARDED fused train step (parallel/fast_sharding.
# fast_train_step) so pod time is pure measurement: on the target slice,
# `tools/export_multichip_kit.py` serializes the step once per mesh size
# and `load_train_step` replays it with no Python tracing (see
# docs/MULTICHIP.md — the runbook). Calling an artifact requires the same
# device count it was exported for (jax.export bakes the mesh).

_STEP_NAME = "train_step.stablehlo"


def export_train_step(fast, mesh, path, *, optimizer=None, mode: int = 0,
                      degree: int = 1) -> Path:
    """Export one sharded fused inverse-rendering train step as ``.rmxs``.

    The exported callable has fast_train_step's signature:
    ``(params, opt_state, target_planes, orientation, translation) ->
    (params, opt_state, loss)`` with params/opt_state/pose replicated and
    target planes row-sharded over the mesh.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ray_marching_tpu.parallel import fast_sharding as fs

    optimizer = optimizer or optax.adam(1e-2)
    step = fs.fast_train_step(fast, mesh, optimizer, mode=mode, degree=degree)
    params = fast.init_params
    opt_state = optimizer.init(params)
    _register_optax_serialization(opt_state)
    target = jax.device_put(
        jnp.zeros((3, fast.rows, 128), fast.dtype),
        NamedSharding(mesh, P(None, tuple(mesh.axis_names), None)),
    )
    q, t = fast.default_pose()
    exported = jexport.export(step)(params, opt_state, target, q, t)

    meta = {
        "format_version": _FORMAT_VERSION,
        "kind": "sharded_train_step",
        "mode": mode,
        "degree": degree,
        "mesh_shape": {k: int(v) for k, v in mesh.shape.items()},
        "num_devices": int(mesh.devices.size),
        "platforms": list(exported.platforms),
        "px_width": fast.config.px_width,
        "px_height": fast.config.px_height,
        "rows": int(fast.rows),
        "marching_steps": fast.config.marching_steps,
        "dtype": np.dtype(fast.dtype).name,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_STEP_NAME, exported.serialize())
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
    return path


def _register_optax_serialization(opt_state):
    """jax.export refuses pytrees with unregistered node types; optax
    optimizer states are namedtuples (ScaleByAdamState, EmptyState, …).
    Register every namedtuple type appearing in this state, idempotently
    (re-registration raises ValueError)."""
    from jax import export as jexport

    def walk(node):
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            try:
                jexport.register_namedtuple_serialization(
                    type(node),
                    serialized_name=f"{type(node).__module__}."
                                    f"{type(node).__qualname__}",
                )
            except ValueError:
                pass  # already registered
            for child in node:
                walk(child)
        elif isinstance(node, (tuple, list)):
            for child in node:
                walk(child)
        elif isinstance(node, dict):
            for child in node.values():
                walk(child)

    walk(opt_state)


def load_train_step(path):
    """Load a ``.rmxs`` sharded-train-step artifact → ``(step_fn, meta)``.

    The process must expose at least ``meta['num_devices']`` devices;
    inputs must carry the shardings recorded at export (replicated
    params/opt_state/pose, row-sharded target planes)."""
    from jax import export as jexport

    with zipfile.ZipFile(path) as zf:
        exported = jexport.deserialize(zf.read(_STEP_NAME))
        meta = json.loads(zf.read(_META_NAME))

    def step_fn(params, opt_state, target, orientation, translation):
        return exported.call(params, opt_state, target, orientation,
                             translation)

    return step_fn, meta
