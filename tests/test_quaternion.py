import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.ops import quaternion as Q


def random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_to_matrix_orthonormal(rng):
    q = random_unit_quats(rng, 64)
    R = np.asarray(Q.to_matrix(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_matrix_roundtrip(rng):
    q = random_unit_quats(rng, 128)
    # canonical sign: w >= 0
    q = np.where(q[:, :1] < 0, -q, q)
    R = Q.to_matrix(jnp.asarray(q))
    q2 = np.asarray(Q.from_matrix(R))
    q2 = np.where(q2[:, :1] < 0, -q2, q2)
    np.testing.assert_allclose(q, q2, atol=1e-4)


def test_multiply_matches_matrix_product(rng):
    a = random_unit_quats(rng, 32)
    b = random_unit_quats(rng, 32)
    Rab = np.asarray(Q.to_matrix(Q.multiply(jnp.asarray(a), jnp.asarray(b))))
    Ra = np.asarray(Q.to_matrix(jnp.asarray(a)))
    Rb = np.asarray(Q.to_matrix(jnp.asarray(b)))
    np.testing.assert_allclose(Rab, np.einsum("nij,njk->nik", Ra, Rb), atol=1e-5)


def test_rotate_matches_matrix(rng):
    q = random_unit_quats(rng, 32)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    out = np.asarray(Q.rotate(jnp.asarray(q), jnp.asarray(v)))
    R = np.asarray(Q.to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(out, np.einsum("nij,nj->ni", R, v), atol=1e-5)


def test_invert(rng):
    q = random_unit_quats(rng, 16)
    ident = np.asarray(Q.multiply(jnp.asarray(q), Q.invert(jnp.asarray(q))))
    np.testing.assert_allclose(ident[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(ident[:, 1:], 0.0, atol=1e-5)


@pytest.mark.parametrize("t", [0.0, 0.3, 1.0])
def test_slerp_endpoints_and_angle(rng, t):
    # rotation about z by theta0 and theta1
    def qz(theta):
        return np.array([np.cos(theta / 2), 0, 0, np.sin(theta / 2)], np.float32)

    q0, q1 = qz(0.2), qz(1.4)
    qt = np.asarray(Q.slerp(jnp.asarray(q0[None]), jnp.asarray(q1[None]),
                            jnp.full((1,), t)))[0]
    expected = qz(0.2 + t * 1.2)
    if qt[0] < 0:
        qt = -qt
    np.testing.assert_allclose(qt, expected, atol=1e-5)


def test_axis_angle_roundtrip(rng):
    aa = rng.normal(size=(64, 3)).astype(np.float32) * 0.8
    q = Q.from_axis_angle(jnp.asarray(aa))
    aa2 = np.asarray(Q.to_axis_angle(q))
    np.testing.assert_allclose(aa, aa2, atol=1e-4)
