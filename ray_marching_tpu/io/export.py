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
