"""SDF primitives: closed-form values and finite-difference gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu.scene import primitives as P


def f64(*vals):
    return [jnp.asarray(v, jnp.float64) for v in vals]


def eval_prim(fn, params, pts):
    pts = jnp.asarray(pts, jnp.float64)
    return np.asarray(fn(params, pts[..., 0], pts[..., 1], pts[..., 2]))


class TestSphere:
    params = {"radius": jnp.asarray(0.5, jnp.float64)}

    def test_values(self):
        d = eval_prim(P.sphere, self.params, [[1.0, 0, 0], [0, 0.5, 0], [0, 0, 0]])
        np.testing.assert_allclose(d, [0.5, 0.0, -0.5], atol=1e-15)

    def test_gradient_is_radial(self):
        g = jax.grad(lambda p: P.sphere(self.params, p[0], p[1], p[2]))(
            jnp.asarray([3.0, 4.0, 0.0])
        )
        np.testing.assert_allclose(g, [0.6, 0.8, 0.0], rtol=1e-12)


class TestBox:
    params = {"halfsides": jnp.asarray([1.0, 2.0, 3.0], jnp.float64)}

    def test_inside_outside_face(self):
        d = eval_prim(
            P.box,
            self.params,
            [[0, 0, 0], [2.0, 0, 0], [0, 0, 4.0], [1.0, 0, 0]],
        )
        np.testing.assert_allclose(d, [-1.0, 1.0, 1.0, 0.0], atol=1e-15)

    def test_corner_distance(self):
        d = eval_prim(P.box, self.params, [[2.0, 3.0, 4.0]])
        np.testing.assert_allclose(d, [np.sqrt(3.0)], rtol=1e-15)


class TestPlane:
    def test_is_x_coordinate(self):
        d = eval_prim(P.plane, {}, [[0.7, 1, 2], [-0.3, 5, 5]])
        np.testing.assert_allclose(d, [0.7, -0.3], atol=0)


class TestLine:
    params = {
        "start": jnp.asarray([-1.0, 0.0, 0.0], jnp.float64),
        "end": jnp.asarray([1.0, 0.0, 0.0], jnp.float64),
        "radius": jnp.asarray(0.1, jnp.float64),
    }

    def test_midpoint_and_caps(self):
        d = eval_prim(
            P.line, self.params, [[0, 0.5, 0], [2.0, 0, 0], [0, 0, 0]]
        )
        np.testing.assert_allclose(d, [0.4, 0.9, -0.1], atol=1e-15)

    def test_endpoint_sphere_region(self):
        d = eval_prim(P.line, self.params, [[1.0 + 0.3, 0.4, 0.0]])
        np.testing.assert_allclose(d, [0.5 - 0.1], rtol=1e-15)


class TestDisk:
    params = {"radius": jnp.asarray(1.0, jnp.float64)}

    def test_on_axis_and_rim(self):
        d = eval_prim(
            P.disk, self.params, [[0.5, 0, 0], [0, 2.0, 0], [0.3, 0.6, 0.8]]
        )
        np.testing.assert_allclose(d, [0.5, 1.0, 0.3], rtol=1e-15)


class TestTorus:
    params = {
        "radius1": jnp.asarray(1.0, jnp.float64),
        "radius2": jnp.asarray(0.25, jnp.float64),
    }

    def test_ring_and_center(self):
        d = eval_prim(
            P.torus, self.params, [[1.0, 0, 0], [0, 0, 0], [2.0, 0, 0]]
        )
        np.testing.assert_allclose(d, [-0.25, 0.75, 0.75], rtol=1e-15)


@pytest.mark.parametrize(
    "fn,params",
    [
        (P.sphere, {"radius": 0.5}),
        (P.box, {"halfsides": (0.4, 0.7, 0.9)}),
        (P.line, {"start": (-1.0, 0.2, 0.1), "end": (0.8, 0.5, -0.3), "radius": 0.2}),
        (P.disk, {"radius": 0.8}),
        (P.torus, {"radius1": 1.0, "radius2": 0.3}),
    ],
)
def test_param_gradients_match_finite_differences(fn, params, rng):
    params = jax.tree.map(lambda v: jnp.asarray(v, jnp.float64), params)
    pts = jnp.asarray(rng.uniform(-2, 2, (32, 3)))

    def loss(pp):
        return jnp.sum(fn(pp, pts[:, 0], pts[:, 1], pts[:, 2]) ** 2)

    grads = jax.grad(loss)(params)
    eps = 1e-6
    flat, treedef = jax.tree.flatten(params)
    for leaf_idx, leaf in enumerate(flat):
        leaf_arr = np.asarray(leaf, np.float64)
        for idx in np.ndindex(leaf_arr.shape or (1,)):
            def perturbed(sign):
                new = leaf_arr.copy()
                if leaf_arr.shape:
                    new[idx] += sign * eps
                else:
                    new = new + sign * eps
                newflat = list(flat)
                newflat[leaf_idx] = jnp.asarray(new)
                return loss(jax.tree.unflatten(treedef, newflat))

            fd = (perturbed(+1) - perturbed(-1)) / (2 * eps)
            got = np.asarray(jax.tree.flatten(grads)[0][leaf_idx])
            got = got[idx] if leaf_arr.shape else got
            np.testing.assert_allclose(got, fd, rtol=1e-5, atol=1e-7)


def test_gradients_wrt_positions_are_unit_near_surfaces(rng):
    """SDF gradients should have unit norm away from singular sets."""
    params = {"radius1": jnp.asarray(1.0), "radius2": jnp.asarray(0.25)}
    pts = jnp.asarray(rng.uniform(-2, 2, (64, 3)))
    g = jax.vmap(
        jax.grad(lambda p: P.torus(params, p[0], p[1], p[2]))
    )(pts)
    norms = np.linalg.norm(np.asarray(g), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-6)
