import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.utils import math3d as m3


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_rotate_consistency(rng):
    q1 = jnp.asarray(random_quat(rng), jnp.float32)
    q2 = jnp.asarray(random_quat(rng), jnp.float32)
    v = jnp.asarray(rng.normal(size=3), jnp.float32)
    a = m3.quat_rotate(m3.quat_mul(q1, q2), v)
    b = m3.quat_rotate(q1, m3.quat_rotate(q2, v))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_quat_mat_roundtrip(rng):
    q = jnp.asarray(random_quat(rng, (32,)), jnp.float32)
    R = m3.quat_to_mat(q)
    q2 = m3.mat_to_quat(R)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quat(rng), jnp.float32)
    v = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    np.testing.assert_allclose(
        m3.quat_rotate(q[None], v), v @ m3.quat_to_mat(q).T, atol=1e-5
    )


def test_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 3)) * 0.5, jnp.float32)
    q = m3.quat_exp(w)
    np.testing.assert_allclose(m3.quat_log(q), w, atol=1e-5)


def test_exp_small_angle():
    w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
    q = m3.quat_exp(w)
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)
    assert jnp.all(jnp.isfinite(m3.quat_log(q)))


def test_ypr_roundtrip(rng):
    ypr = jnp.asarray(
        np.stack(
            [
                rng.uniform(-np.pi, np.pi, 32),
                rng.uniform(-1.3, 1.3, 32),
                rng.uniform(-1.3, 1.3, 32),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    R = m3.ypr_to_mat(ypr)
    np.testing.assert_allclose(m3.mat_to_ypr(R), ypr, atol=1e-4)
    q = m3.ypr_to_quat(ypr)
    np.testing.assert_allclose(m3.quat_to_ypr(q), ypr, atol=1e-4)


def test_se3_compose_inverse(rng):
    q = jnp.asarray(random_quat(rng), jnp.float32)
    t = jnp.asarray(rng.normal(size=3), jnp.float32)
    qi, ti = m3.se3_inverse(q, t)
    qc, tc = m3.se3_compose(q, t, qi, ti)
    np.testing.assert_allclose(jnp.abs(qc[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-5)


def test_slerp_endpoints(rng):
    q0 = jnp.asarray(random_quat(rng), jnp.float32)
    q1 = jnp.asarray(random_quat(rng), jnp.float32)
    np.testing.assert_allclose(
        jnp.abs(jnp.sum(m3.quat_slerp(q0, q1, 0.0) * q0)), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        jnp.abs(jnp.sum(m3.quat_slerp(q0, q1, 1.0) * q1)), 1.0, atol=1e-5
    )


def test_skew_cross(rng):
    a = jnp.asarray(rng.normal(size=3), jnp.float32)
    b = jnp.asarray(rng.normal(size=3), jnp.float32)
    np.testing.assert_allclose(m3.skew(a) @ b, jnp.cross(a, b), atol=1e-6)
