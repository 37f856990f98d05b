import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gvins_tpu.common import rotation as rot


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_matrix_product():
    key = jax.random.PRNGKey(0)
    q1 = random_quats(key, 16)
    q2 = random_quats(jax.random.PRNGKey(1), 16)
    lhs = rot.quat_to_matrix(rot.quat_mul(q1, q2))
    rhs = rot.quat_to_matrix(q1) @ rot.quat_to_matrix(q2)
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_quat_rotate_matches_matrix():
    q = random_quats(jax.random.PRNGKey(2), 32)
    v = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
    np.testing.assert_allclose(
        rot.quat_rotate(q, v),
        jnp.einsum("nij,nj->ni", rot.quat_to_matrix(q), v),
        atol=1e-12,
    )


def test_matrix_quat_roundtrip():
    q = random_quats(jax.random.PRNGKey(4), 64)
    q2 = rot.matrix_to_quat(rot.quat_to_matrix(q))
    # sign ambiguity
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * q2, atol=1e-12)


def test_rotvec_roundtrip_and_small_angle():
    # log returns the principal rotation, so only |rv| < pi roundtrips exactly
    raw = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    rv = raw / jnp.linalg.norm(raw, axis=-1, keepdims=True) * 3.1
    rv = rv * jax.random.uniform(jax.random.PRNGKey(15), (16, 1))
    rv2 = rot.quat_to_rotvec(rot.rotvec_to_quat(rv))
    np.testing.assert_allclose(rv, rv2, atol=1e-10)
    # beyond pi the rotations must still agree
    big = raw * 2.0
    q1 = rot.rotvec_to_quat(big)
    q2 = rot.rotvec_to_quat(rot.quat_to_rotvec(q1))
    sign = jnp.sign(jnp.sum(q1 * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q1, sign * q2, atol=1e-10)

    tiny = jnp.array([[1e-12, -2e-13, 3e-12], [0.0, 0.0, 0.0]])
    q = rot.rotvec_to_quat(tiny)
    assert jnp.all(jnp.isfinite(q))
    np.testing.assert_allclose(rot.quat_to_rotvec(q), tiny, atol=1e-15)


def test_rotvec_grad_finite_at_zero():
    g = jax.grad(lambda v: rot.rotvec_to_quat(v)[0])(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_euler_roundtrip_and_heading_range():
    euler = jnp.array(
        [[0.1, -0.2, 0.3], [-1.0, 0.5, 4.0], [0.0, 0.0, 6.2], [0.3, 1.0, 0.01]]
    )
    m = rot.euler_to_matrix(euler)
    e2 = rot.matrix_to_euler(m)
    np.testing.assert_allclose(euler, e2, atol=1e-12)
    assert jnp.all(e2[:, 2] >= 0) and jnp.all(e2[:, 2] < 2 * jnp.pi)


def test_skew_cross_product():
    v = jax.random.normal(jax.random.PRNGKey(6), (8, 3))
    u = jax.random.normal(jax.random.PRNGKey(7), (8, 3))
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", rot.skew(v), u), jnp.cross(v, u), atol=1e-12
    )


def test_quat_left_right_product_matrices():
    q = random_quats(jax.random.PRNGKey(8), 8)
    p = random_quats(jax.random.PRNGKey(9), 8)
    qp = rot.quat_mul(q, p)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", rot.quat_left(q), p), qp, atol=1e-12
    )
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", rot.quat_right(p), q), qp, atol=1e-12
    )


def test_quat_inv():
    q = random_quats(jax.random.PRNGKey(10), 8)
    ident = rot.quat_mul(q, rot.quat_inv(q))
    np.testing.assert_allclose(ident[:, 0], jnp.ones(8), atol=1e-12)
    np.testing.assert_allclose(ident[:, 1:], jnp.zeros((8, 3)), atol=1e-12)
