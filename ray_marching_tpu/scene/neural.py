"""Neural SDF nodes: small MLP distance fields as first-class scene nodes.

An extension beyond the reference's analytic primitives: a scene-graph leaf
whose signed distance is a small coordinate MLP. It composes with every
CSG operator (union with analytic shapes, affine transforms, onion shells…)
and its weights live in the same differentiable params pytree, so inverse
rendering trains neural implicit surfaces through the renderer exactly like
analytic radii (cf. the neural-SDF differentiable-rendering literature,
PAPERS.md).

TPU note — two evaluation strategies, selected by width (``impl`` field):

* ``componentwise``: hidden unit j is itself a (rows, 128) plane computed
  as ``act(x·W1[0,j] + y·W1[1,j] + z·W1[2,j] + b_j)`` and deeper layers
  are plane linear combinations — pure VPU ops, O(width²) plane FMAs per
  layer. Optimal for tiny widths (≤ ~16) where matmul padding would waste
  the MXU.
* ``matmul``: coordinates are collapsed to one ray-major block
  ``P = (3, N)`` and the whole MLP runs as a chain of 2-D matmuls
  ``H ← act(Wᵢᵀ @ H + bᵢ)`` on the **MXU** (the systolic array — the
  hardware unit the componentwise form never touches). The collapse is a
  lane-major reshape ``(rows, 128) → (1, rows·128)``, which Mosaic lowers
  (verified on v5e), so the SAME evaluator runs under jnp/XLA AND inside
  the fused Pallas mega-kernel; XLA paths fuse the reshapes away
  entirely. Width scaling is the MXU's, not the VPU's — see
  docs/PERFORMANCE.md for the measured crossover.

Activations: ``sine`` (SIREN init — the standard choice for coordinate
MLPs), ``sine_fast`` (range-reduced polynomial sine — see
:func:`sin_fast`; measured 10× forward at width 256, the recommended
form on TPU), ``softplus``, ``tanh``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_marching_tpu.scene.graph import Node

_TWO_PI = 2.0 * math.pi
#: Odd-polynomial minimax-ish fit of sin on [-pi, pi] (least squares on
#: Chebyshev nodes, 6 terms / degree 11): max abs error 9.65e-8 — at the
#: f32 ulp level of the outputs. Derived in-repo (round 5); see sin_fast.
_SIN_COEFFS = (
    0.99999959991984499,
    -0.16666552635387408,
    0.0083324029887569036,
    -0.00019808633342873594,
    2.6997146373165627e-06,
    -2.0362244904890236e-08,
)


# Cody-Waite split of 2π: HI is exact in 8 mantissa bits (201/32), so
# k·HI is exact in f32 for |k| < 2^15 and the reduction error is only
# k·ulp(LO) ≈ |x|·4e-11 — a single-constant reduction inherits
# k·|2π − fl32(2π)| ≈ |x|·2e-8 instead (6e-6 at |x|=300, f32).
_TWO_PI_HI = 6.28125
_TWO_PI_LO = _TWO_PI - _TWO_PI_HI


def _reduce_poly(x):
    k = jnp.round(x * (1.0 / _TWO_PI))
    r = (x - k * _TWO_PI_HI) - k * _TWO_PI_LO
    r2 = r * r
    p = jnp.asarray(_SIN_COEFFS[-1], x.dtype)
    for c in _SIN_COEFFS[-2::-1]:
        p = p * r2 + c
    return r, r2, p


@jax.custom_jvp
def sin_fast(x):
    """Polynomial sine: ~10 VPU ops instead of ``jnp.sin``'s conservative
    multi-branch lowering.

    Measured on v5e (512², 16 steps, width-256 matmul NeuralSDF): the
    forward render is **74.0 ms with jnp.sin vs 6.8 ms with tanh** — the
    transcendental, not the MXU, sets the pace of SIREN fields. This
    range-reduces to [-π, π] with a two-constant Cody-Waite split (k·HI
    exact in f32 for |k| < 2^15, residual error ~|x|·4e-11) and
    evaluates a 6-term odd minimax fit: max abs error 9.65e-8 in f64;
    in f32 polynomial/reduction rounding brings it to ≤ 2e-6 vs the
    exact sine of the same f32 input over |x| ≤ 300
    (tests/test_neural.py; the f32 INPUT quantization itself, ~|x|·6e-8,
    is the larger effect and applies to jnp.sin equally).

    Differentiation: a custom JVP evaluates the EXACT derivative of the
    polynomial, ``d/dx [r·p(r²)] = p + 2r²·p'(r²)`` (~5e-6 vs cos —
    self-consistent with the evaluated function), holding ONE residual
    plane like jnp.sin's cos. The naive autodiff alternative kept
    r/r²/partial products live per activation — measured 107.7M of a
    102M scoped-VMEM budget in the width-64 fused backward kernel
    (jax.checkpoint would fix that but remat2 has no Pallas TPU
    lowering, probed v5e).
    """
    r, _, p = _reduce_poly(x)
    return r * p


@sin_fast.defjvp
def _sin_fast_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    r, r2, p = _reduce_poly(x)
    dp = jnp.asarray((len(_SIN_COEFFS) - 1) * _SIN_COEFFS[-1], x.dtype)
    for k in range(len(_SIN_COEFFS) - 2, 0, -1):
        dp = dp * r2 + k * _SIN_COEFFS[k]
    return r * p, (p + 2.0 * r2 * dp) * t


#: "auto" impl picks matmul at/above this max hidden width. Round-3 put
#: the crossover at 32 (componentwise won w16 train by ~5% under jnp.sin);
#: round-5 re-measured with sine_fast — matmul wins w16 decisively
#: (train 4.97 vs 30.9 ms at 512², and it dispatches to the
#: fast-compiling XLA march) and the sine gap was within noise with
#: 2.5× faster compiles, so matmul takes everything from 8 up. Truly
#: tiny nets (hidden < 8) stay componentwise — MXU tiles would run
#: nearly empty and nobody has measured them.
MATMUL_MIN_WIDTH = 8


@dataclass(frozen=True)
class NeuralSDF(Node):
    """MLP distance field leaf.

    Attributes:
        hidden: widths of the hidden layers.
        activation: 'sine' | 'sine_fast' | 'softplus' | 'tanh'
            ('sine_fast' = polynomial sine, ~10x faster forward on TPU
            at f32-ulp accuracy; see sin_fast).
        w0: SIREN frequency scale for the first layer (sine variants).
        seed: weight-init seed (deterministic scenes).
        scale: output scale — a freshly-initialized field is roughly a
            sphere-ish blob of this radius around the origin (see
            init_neural_params).
        impl: 'auto' (width-based, MATMUL_MIN_WIDTH) | 'matmul' (MXU) |
            'componentwise' (VPU planes). Same math either way; matmul
            reassociates the accumulation (parity to roundoff, pinned by
            tests/test_neural_matmul.py).
        matmul_dtype: matmul OPERAND precision for the matmul impl —
            'float32' (default; exact, but each f32 dot decomposes into
            multiple MXU bf16 passes) or 'bfloat16' (native single-pass
            MXU: operands round to bf16, accumulation stays f32 via
            preferred_element_type — ~3 decimal digits on the field value,
            usually immaterial next to sphere-tracing convergence
            tolerance; measure on your scene).
    """

    hidden: Tuple[int, ...] = (16, 16)
    activation: str = "sine"
    w0: float = 8.0
    seed: int = 0
    scale: float = 0.5
    impl: str = "auto"
    matmul_dtype: str = "float32"


def init_neural_params(node: NeuralSDF, dtype=jnp.float32):
    """SIREN-style init; the last layer starts near zero so the initial
    field is dominated by the sphere skip term (a well-behaved SDF to start
    marching against)."""
    rng = np.random.default_rng(node.seed)
    sizes = (3,) + tuple(node.hidden) + (1,)
    params = {}
    for i, (nin, nout) in enumerate(zip(sizes[:-1], sizes[1:])):
        if node.activation.startswith("sine"):
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


def _activation(node: NeuralSDF):
    if node.activation == "sine":
        return jnp.sin
    if node.activation == "sine_fast":
        return sin_fast
    if node.activation == "softplus":
        return lambda v: jnp.logaddexp(v, 0.0)
    return jnp.tanh


def _base_term(params, x, y, z):
    """Analytic sphere skip term: keeps the far field eikonal-ish so sphere
    tracing converges while the MLP shapes the surface."""
    return jnp.sqrt(x * x + y * y + z * z) - params["radius"]


def neural_sdf_componentwise(node: NeuralSDF):
    """Componentwise (VPU-plane) evaluator ``f(params, x, y, z) -> d``.

    O(width²) plane FMAs per hidden layer — the right form for tiny widths
    where MXU tiles would run mostly empty.
    """
    n_layers = len(node.hidden) + 1
    act = _activation(node)

    def evaluate(params, x, y, z):
        planes = [x, y, z]
        for layer in range(n_layers):
            w = params[f"w{layer}"]
            b = params[f"b{layer}"]
            nin, nout = w.shape
            scale = (node.w0 if (layer == 0
                      and node.activation.startswith("sine")) else 1.0)
            out_planes = []
            for j in range(nout):
                acc = b[j]
                for i in range(nin):
                    acc = acc + planes[i] * w[i, j]
                if layer < n_layers - 1:
                    acc = act(acc * scale)
                out_planes.append(acc)
            planes = out_planes
        return _base_term(params, x, y, z) + planes[0]

    return evaluate


def neural_sdf_matmul(node: NeuralSDF):
    """Matmul-native (MXU) evaluator ``f(params, x, y, z) -> d``.

    Coordinates collapse to a ray-major block ``P = (3, N)``; every layer
    is one 2-D matmul ``H ← act(Wᵀ @ H + b)`` with N rays on lanes — the
    shape the 128×128 systolic array is built for. The collapse reshape
    ``(rows, 128) → (1, rows·128)`` lowers under Mosaic (verified v5e), so
    this evaluator runs inside the fused Pallas mega-kernel too; under
    jnp/XLA the reshapes fuse away. Bitwise-identical to itself across
    paths; differs from the componentwise form only by accumulation order.
    """
    n_layers = len(node.hidden) + 1
    act = _activation(node)
    op_dtype = jnp.bfloat16 if node.matmul_dtype == "bfloat16" else None

    def evaluate(params, x, y, z):
        shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y), jnp.shape(z))
        n = 1
        for s in shape:
            n *= s
        dtype = jnp.result_type(x, y, z)
        h = jnp.concatenate(
            [
                jnp.broadcast_to(v, shape).astype(dtype).reshape(1, n)
                for v in (x, y, z)
            ],
            axis=0,
        )  # (3, N) ray-major block
        for layer in range(n_layers):
            w = params[f"w{layer}"]  # (nin, nout)
            b = params[f"b{layer}"]  # (nout,)
            scale = (node.w0 if (layer == 0
                      and node.activation.startswith("sine")) else 1.0)
            lhs, rhs = w.T, h
            if op_dtype is not None and dtype == jnp.float32:
                lhs, rhs = lhs.astype(op_dtype), rhs.astype(op_dtype)
            h = (
                jnp.dot(lhs, rhs, preferred_element_type=dtype)
                + b.reshape(-1, 1)
            )  # (nout, N) — MXU, f32 accumulation
            if layer < n_layers - 1:
                h = act(h * scale)
        return _base_term(params, x, y, z) + h.reshape(shape)

    return evaluate


def resolve_impl(node: NeuralSDF) -> str:
    if node.impl != "auto":
        return node.impl
    width = max(node.hidden) if node.hidden else 0
    return "matmul" if width >= MATMUL_MIN_WIDTH else "componentwise"


def neural_sdf(node: NeuralSDF):
    """Compile the evaluator ``f(params, x, y, z) -> d`` (impl-dispatched).

    The field is ``sphere(|p|, radius) + mlp(p)`` — an analytic skip term
    keeps the far field eikonal-ish so sphere tracing converges while the
    MLP shapes the surface.
    """
    impl = resolve_impl(node)
    if impl == "matmul":
        return neural_sdf_matmul(node)
    if impl == "componentwise":
        return neural_sdf_componentwise(node)
    raise ValueError(f"unknown NeuralSDF impl: {node.impl!r}")


# NeuralSDF goes through the same extensibility door as third-party nodes
# (graph.register_custom_node); importing this module makes the node
# compilable, trainable, and JSON-serializable.
from ray_marching_tpu.scene.graph import register_custom_node  # noqa: E402

register_custom_node(NeuralSDF, neural_sdf, init_neural_params)
