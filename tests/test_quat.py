"""Quaternion algebra: identities and reference-semantics checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from ray_marching_tpu import quat


def random_quats(rng, n, unit=True):
    q = rng.standard_normal((n, 4))
    if unit:
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def random_vecs(rng, n):
    return jnp.asarray(rng.standard_normal((n, 3)))


def test_cross_matches_numpy(rng):
    u, v = random_vecs(rng, 64), random_vecs(rng, 64)
    got = quat.cross(u, v)
    want = np.cross(np.asarray(u), np.asarray(v))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_multiply_norm_multiplicative(rng):
    p, q = random_quats(rng, 64, unit=False), random_quats(rng, 64, unit=False)
    pq = quat.multiply(p, q)
    np.testing.assert_allclose(
        np.linalg.norm(pq, axis=-1),
        np.linalg.norm(p, axis=-1) * np.linalg.norm(q, axis=-1),
        rtol=1e-12,
    )


def test_multiply_identity_and_conjugate(rng):
    q = random_quats(rng, 16)
    e = jnp.asarray([[1.0, 0, 0, 0]] * 16)
    np.testing.assert_allclose(quat.multiply(e, q), q, rtol=1e-12)
    np.testing.assert_allclose(quat.multiply(q, e), q, rtol=1e-12)
    qqbar = quat.multiply(q, quat.conjugate(q))
    np.testing.assert_allclose(qqbar, e, atol=1e-12)


def test_rotation_preserves_norm_and_matches_matrix(rng):
    q = random_quats(rng, 32)
    v = random_vecs(rng, 32)
    rotated = quat.rotation(v, q)
    np.testing.assert_allclose(
        np.linalg.norm(rotated, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-12
    )
    mats = quat.to_so3(q)
    via_matrix = jnp.einsum("nij,nj->ni", mats, v)
    np.testing.assert_allclose(rotated, via_matrix, rtol=1e-10, atol=1e-12)


def test_rotation_composition(rng):
    p, q = random_quats(rng, 16), random_quats(rng, 16)
    v = random_vecs(rng, 16)
    lhs = quat.rotation(quat.rotation(v, q), p)
    rhs = quat.rotation(v, quat.multiply(p, q))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9, atol=1e-12)


def test_to_so3_orthogonal(rng):
    q = random_quats(rng, 16)
    mats = np.asarray(quat.to_so3(q))
    eye = np.eye(3)
    for m in mats:
        np.testing.assert_allclose(m @ m.T, eye, atol=1e-12)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-12)


def test_to_versor_unit(rng):
    v = jnp.asarray(rng.uniform(-0.5, 0.5, (32, 3)))
    q = quat.to_versor(v)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, rtol=1e-12)
    np.testing.assert_allclose(q[..., 1:], v)


def test_componentwise_consistency(rng):
    q = random_quats(rng, 8)
    v = random_vecs(rng, 8)
    got = jnp.stack(
        quat.rotate_c(
            q[:, 0], q[:, 1], q[:, 2], q[:, 3], v[:, 0], v[:, 1], v[:, 2]
        ),
        axis=-1,
    )
    np.testing.assert_allclose(got, quat.rotation(v, q), rtol=1e-12)

    p = random_quats(rng, 8, unit=False)
    r = random_quats(rng, 8, unit=False)
    got = jnp.stack(
        quat.multiply_c(
            p[:, 0], p[:, 1], p[:, 2], p[:, 3], r[:, 0], r[:, 1], r[:, 2], r[:, 3]
        ),
        axis=-1,
    )
    np.testing.assert_allclose(got, quat.multiply(p, r), rtol=1e-12)


def test_normalize(rng):
    q = random_quats(rng, 8, unit=False)
    np.testing.assert_allclose(
        np.linalg.norm(quat.normalize(q), axis=-1), 1.0, rtol=1e-12
    )
