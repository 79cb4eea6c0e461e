"""Property-based invariants (hypothesis) for the math / hash foundations."""
import numpy as np
import pytest
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from rgc_slam_tpu.ops import voxelhash as vh
from rgc_slam_tpu.ops.covariance import eigh3x3
from rgc_slam_tpu.utils import math3d as m3

finite = st.floats(-100.0, 100.0, allow_nan=False, allow_infinity=False)
angle = st.floats(-3.1, 3.1, allow_nan=False)
small = st.floats(-1.0, 1.0, allow_nan=False)


def vec3(draw_from=finite):
    return st.tuples(draw_from, draw_from, draw_from).map(
        lambda t: jnp.asarray(t, jnp.float32)
    )


@settings(max_examples=30, deadline=None)
@given(w=vec3(small))
def test_exp_log_inverse(w):
    q = m3.quat_exp(w)
    np.testing.assert_allclose(np.asarray(m3.quat_log(q)), np.asarray(w),
                               atol=1e-4)
    # unit norm
    assert abs(float(jnp.linalg.norm(q)) - 1.0) < 1e-5


@settings(max_examples=30, deadline=None)
@given(w=vec3(small), v=vec3())
def test_rotation_preserves_norm(w, v):
    q = m3.quat_exp(w)
    rv = m3.quat_rotate(q, v)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(rv)), float(jnp.linalg.norm(v)), rtol=1e-4,
        atol=1e-3,
    )


@settings(max_examples=30, deadline=None)
@given(w1=vec3(small), w2=vec3(small), v=vec3())
def test_compose_associative_on_points(w1, w2, v):
    q1, q2 = m3.quat_exp(w1), m3.quat_exp(w2)
    t1 = jnp.asarray([1.0, -2.0, 0.5])
    t2 = jnp.asarray([0.3, 0.0, -1.0])
    qc, tc = m3.se3_compose(q1, t1, q2, t2)
    a = m3.se3_apply(qc, tc, v)
    b = m3.se3_apply(q1, t1, m3.se3_apply(q2, t2, v))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@settings(max_examples=30, deadline=None)
@given(ypr=st.tuples(angle, st.floats(-1.4, 1.4), st.floats(-1.4, 1.4)))
def test_ypr_matrix_roundtrip(ypr):
    y = jnp.asarray(ypr, jnp.float32)
    R = m3.ypr_to_mat(y)
    # proper rotation
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m3.mat_to_ypr(R)), np.asarray(y),
                               atol=1e-4)


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 300),
       res=st.sampled_from([0.25, 0.5, 1.0, 2.0]))
def test_voxelhash_claiming_invariants(seed, n, res):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-50, 50, (n, 3)), jnp.float32)
    keys = vh.pack_coords(vh.voxel_coords(pts, res), jnp.ones(n, bool))
    ht = vh.build_hash_table(keys, cap=1024)
    slots = np.asarray(ht.slot_of_point)
    keys_np = np.asarray(keys)
    table = np.asarray(ht.table_keys)
    ok = slots >= 0
    # assigned slot stores exactly our key
    assert (table[slots[ok]] == keys_np[ok]).all()
    # same key -> same slot
    for k in np.unique(keys_np):
        s = np.unique(slots[keys_np == k])
        assert len(s) == 1
    # lookup agrees with assignment
    found = np.asarray(vh.lookup_slots(ht.table_keys, keys))
    assert (found[ok] == slots[ok]).all()


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_eigh3x3_reconstruction(seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3, 3)).astype(np.float32)
    S = A @ A.T + 0.01 * np.eye(3, dtype=np.float32)
    evals, evecs = eigh3x3(jnp.asarray(S))
    R = np.asarray(evecs) @ np.diag(np.asarray(evals)) @ np.asarray(evecs).T
    scale = max(1.0, float(np.abs(S).max()))
    assert np.abs(R - S).max() / scale < 5e-3
    assert (np.diff(np.asarray(evals)) >= -1e-4).all(), "ascending order"


@pytest.mark.slow
@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_preintegration_cov_psd_and_mean_parity(seed):
    """For any masked IMU window: full-propagation means equal the light
    path exactly; covariance stays symmetric PSD; Jacobian stays finite."""
    from rgc_slam_tpu.ops import imu as imu_ops
    from rgc_slam_tpu.types import ImuBatch

    rng = np.random.default_rng(seed)
    m = 24
    ts = 0.005 * (1 + np.arange(m))
    imu = ImuBatch(
        t=jnp.asarray(ts, jnp.float32),
        acc=jnp.asarray(rng.normal([0, 0, 9.81], 0.5, (m, 3)), jnp.float32),
        gyr=jnp.asarray(rng.normal(0, 0.3, (m, 3)), jnp.float32),
        mask=jnp.asarray(rng.random(m) > 0.2),
    )
    ba = jnp.asarray(rng.normal(0, 0.05, 3), jnp.float32)
    bg = jnp.asarray(rng.normal(0, 0.01, 3), jnp.float32)
    t0, t1 = jnp.asarray(0.0), jnp.asarray(0.15)
    lite = imu_ops.preintegrate(imu, t0, t1, ba, bg)
    full = imu_ops.preintegrate_full(imu, t0, t1, ba, bg)
    np.testing.assert_allclose(np.asarray(full.delta_q), np.asarray(lite.delta_q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.delta_p), np.asarray(lite.delta_p), atol=1e-6)
    cov = np.asarray(full.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-9)
    assert np.linalg.eigvalsh(cov).min() > -1e-8
    assert np.isfinite(np.asarray(full.jac)).all()


@pytest.mark.slow
@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_pgo_pin_and_chain_consistency(seed):
    """For any drifted chain + exact loop: the pinned (oldest-loop) keyframe
    keeps its pose exactly, and the solve never increases the loop residual."""
    import dataclasses
    from rgc_slam_tpu.config import TEST_CONFIG
    from rgc_slam_tpu.models import loop as loop_mod
    from rgc_slam_tpu.models.mapping import MappingState

    rng = np.random.default_rng(seed)
    cfg = dataclasses.replace(TEST_CONFIG, max_keyframes=48, max_loops=4)
    K = 32
    ms = MappingState.init(cfg)
    gt_t = np.stack([np.arange(K) * 1.0, np.zeros(K), np.zeros(K)], 1)
    est_t = gt_t + np.cumsum(rng.normal(0, 0.05, (K, 3)), axis=0)
    est_yaw = np.cumsum(rng.normal(0, 0.01, K))
    q = np.asarray(m3.ypr_to_quat(jnp.asarray(
        np.stack([est_yaw, np.zeros(K), np.zeros(K)], 1), jnp.float32)))
    ms = ms.replace(
        kf_q=ms.kf_q.at[:K].set(q),
        kf_t=ms.kf_t.at[:K].set(jnp.asarray(est_t, jnp.float32)),
        kf_count=jnp.asarray(K, jnp.int32),
        kf_travel=ms.kf_travel.at[:K].set(jnp.arange(K, dtype=jnp.float32)),
    )
    ls = loop_mod.LoopState.init(cfg)
    i, j = K - 1, 5
    rel_t = jnp.asarray(gt_t[i] - gt_t[j], jnp.float32)
    ls = ls.replace(
        loop_i=ls.loop_i.at[0].set(i), loop_j=ls.loop_j.at[0].set(j),
        loop_t=ls.loop_t.at[0].set(rel_t),
        loop_count=jnp.asarray(1, jnp.int32),
    )
    out = loop_mod._pgo_solve(ms, ls, cfg)
    # pinned keyframe (oldest loop anchor, j) keeps its pose exactly
    np.testing.assert_allclose(np.asarray(out.kf_t[j]), est_t[j], atol=1e-3)

    def loop_err(kf_t, kf_q):
        yaw_j = float(m3.quat_to_ypr(jnp.asarray(kf_q[j]))[0])
        c, s = np.cos(yaw_j), np.sin(yaw_j)
        Rj = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        return np.linalg.norm(Rj.T @ (kf_t[i] - kf_t[j]) - np.asarray(rel_t))

    before = loop_err(est_t, q)
    after = loop_err(np.asarray(out.kf_t[:K]), np.asarray(out.kf_q[:K]))
    assert after <= before + 1e-3
