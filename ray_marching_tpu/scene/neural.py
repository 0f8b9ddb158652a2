"""Neural SDF nodes: small MLP distance fields as first-class scene nodes.

An extension beyond the reference's analytic primitives: a scene-graph leaf
whose signed distance is a small coordinate MLP. It composes with every
CSG operator (union with analytic shapes, affine transforms, onion shells…)
and its weights live in the same differentiable params pytree, so inverse
rendering trains neural implicit surfaces through the renderer exactly like
analytic radii (cf. the neural-SDF differentiable-rendering literature,
PAPERS.md).

TPU note: the MLP is evaluated **componentwise over coordinate planes** —
hidden unit j is itself a (rows, 128) plane computed as
``act(x·W1[0,j] + y·W1[1,j] + z·W1[2,j] + b_j)`` and deeper layers are
plane linear combinations. At the widths that matter for shape fitting
(8–64) this stays in the Pallas mega-kernel as pure VPU ops: no reshapes,
no gathers, and the same code runs under jnp and Mosaic.

Activations: ``sine`` (SIREN init — the standard choice for coordinate
MLPs), ``softplus``, ``tanh``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.scene.graph import Node


@dataclass(frozen=True)
class NeuralSDF(Node):
    """MLP distance field leaf.

    Attributes:
        hidden: widths of the hidden layers.
        activation: 'sine' | 'softplus' | 'tanh'.
        w0: SIREN frequency scale for the first layer (sine only).
        seed: weight-init seed (deterministic scenes).
        scale: output scale — a freshly-initialized field is roughly a
            sphere-ish blob of this radius around the origin (see
            init_neural_params).
    """

    hidden: Tuple[int, ...] = (16, 16)
    activation: str = "sine"
    w0: float = 8.0
    seed: int = 0
    scale: float = 0.5


def init_neural_params(node: NeuralSDF, dtype=jnp.float32):
    """SIREN-style init; the last layer starts near zero so the initial
    field is dominated by the sphere skip term (a well-behaved SDF to start
    marching against)."""
    rng = np.random.default_rng(node.seed)
    sizes = (3,) + tuple(node.hidden) + (1,)
    params = {}
    for i, (nin, nout) in enumerate(zip(sizes[:-1], sizes[1:])):
        if node.activation == "sine":
            bound = (1.0 / nin) if i == 0 else np.sqrt(6.0 / nin) / node.w0
        else:
            bound = np.sqrt(6.0 / (nin + nout))
        w = rng.uniform(-bound, bound, (nin, nout))
        if i == len(sizes) - 2:
            w = w * 0.01  # near-zero residual at init
        params[f"w{i}"] = jnp.asarray(w, dtype)
        params[f"b{i}"] = jnp.zeros((nout,), dtype)
    params["radius"] = jnp.asarray(node.scale, dtype)
    return params


def neural_sdf(node: NeuralSDF):
    """Compile a componentwise evaluator ``f(params, x, y, z) -> d``.

    The field is ``sphere(|p|, radius) + mlp(p)`` — an analytic skip term
    keeps the far field eikonal-ish so sphere tracing converges while the
    MLP shapes the surface.
    """
    n_layers = len(node.hidden) + 1

    if node.activation == "sine":
        act = jnp.sin
    elif node.activation == "softplus":
        act = lambda v: jnp.logaddexp(v, 0.0)
    else:
        act = jnp.tanh

    def evaluate(params, x, y, z):
        planes = [x, y, z]
        for layer in range(n_layers):
            w = params[f"w{layer}"]
            b = params[f"b{layer}"]
            nin, nout = w.shape
            scale = node.w0 if (layer == 0 and node.activation == "sine") else 1.0
            out_planes = []
            for j in range(nout):
                acc = b[j]
                for i in range(nin):
                    acc = acc + planes[i] * w[i, j]
                if layer < n_layers - 1:
                    acc = act(acc * scale)
                out_planes.append(acc)
            planes = out_planes
        base = jnp.sqrt(x * x + y * y + z * z) - params["radius"]
        return base + planes[0]

    return evaluate


# NeuralSDF goes through the same extensibility door as third-party nodes
# (graph.register_custom_node); importing this module makes the node
# compilable, trainable, and JSON-serializable.
from ray_marching_tpu.scene.graph import register_custom_node  # noqa: E402

register_custom_node(NeuralSDF, neural_sdf, init_neural_params)
