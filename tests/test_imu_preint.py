"""Preintegration uncertainty propagation (VERDICT r1 item 9).

Validates ops/imu.preintegrate_full — the 15-dim covariance + bias-Jacobian
propagation (reference ``IntegrationBase``, utility.h:303-380) — against
ground truth the reference never had: a Monte-Carlo ensemble and a
finite-difference bias check.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.ops import imu as imu_ops
from rgc_slam_tpu.types import ImuBatch
from rgc_slam_tpu.utils import math3d as m3

ACC_N, GYR_N = 0.08, 0.004


def _make_batch(m=40, dt=0.005, t0=0.0, acc=None, gyr=None):
    ts = t0 + dt * (1 + np.arange(m))
    acc = np.tile([0.1, -0.2, 9.81], (m, 1)) if acc is None else acc
    gyr = np.tile([0.02, -0.01, 0.3], (m, 1)) if gyr is None else gyr
    return ImuBatch(
        t=jnp.asarray(ts, jnp.float32),
        acc=jnp.asarray(acc, jnp.float32),
        gyr=jnp.asarray(gyr, jnp.float32),
        mask=jnp.ones(m, bool),
    )


def test_full_matches_mean_only():
    """Mean propagation must agree exactly with the light-weight preintegrate."""
    imu = _make_batch()
    ba, bg = jnp.zeros(3), jnp.zeros(3)
    lite = imu_ops.preintegrate(imu, jnp.asarray(0.0), jnp.asarray(0.2), ba, bg)
    full = imu_ops.preintegrate_full(imu, jnp.asarray(0.0), jnp.asarray(0.2), ba, bg)
    np.testing.assert_allclose(np.asarray(full.delta_q), np.asarray(lite.delta_q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.delta_p), np.asarray(lite.delta_p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.delta_v), np.asarray(lite.delta_v), atol=1e-6)
    cov = np.asarray(full.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(cov) > -1e-12)


def test_covariance_matches_monte_carlo():
    """Propagated σ must match an ensemble of noisy re-integrations (±35%)."""
    m, dt = 40, 0.005
    imu = _make_batch(m, dt)
    ba, bg = jnp.zeros(3), jnp.zeros(3)
    full = imu_ops.preintegrate_full(
        imu, jnp.asarray(0.0), jnp.asarray(0.2), ba, bg,
        acc_n=ACC_N, gyr_n=GYR_N, acc_w=0.0, gyr_w=0.0,
    )

    def noisy(key):
        ka, kg = jax.random.split(key)
        # discrete sample noise for white density σ: σ/sqrt(dt)
        na = ACC_N / np.sqrt(dt) * jax.random.normal(ka, (m, 3))
        ng = GYR_N / np.sqrt(dt) * jax.random.normal(kg, (m, 3))
        pre = imu_ops.preintegrate(
            imu.replace(acc=imu.acc + na, gyr=imu.gyr + ng),
            jnp.asarray(0.0), jnp.asarray(0.2), ba, bg,
        )
        th = m3.quat_log(m3.quat_mul(m3.quat_conj(full.delta_q), pre.delta_q))
        return jnp.concatenate([pre.delta_p - full.delta_p, th, pre.delta_v - full.delta_v])

    devs = jax.vmap(noisy)(jax.random.split(jax.random.PRNGKey(0), 400))
    emp = np.std(np.asarray(devs), axis=0)
    prop = np.sqrt(np.diag(np.asarray(full.cov))[:9])
    ratio = emp / np.maximum(prop, 1e-12)
    assert np.all(ratio > 0.65) and np.all(ratio < 1.35), ratio


def test_bias_jacobian_first_order():
    """bias_corrected_delta must match re-integration at a perturbed bias."""
    imu = _make_batch()
    ba, bg = jnp.zeros(3), jnp.zeros(3)
    full = imu_ops.preintegrate_full(imu, jnp.asarray(0.0), jnp.asarray(0.2), ba, bg)
    dba = jnp.asarray([0.02, -0.01, 0.03])
    dbg = jnp.asarray([0.002, 0.001, -0.003])
    exact = imu_ops.preintegrate(
        imu, jnp.asarray(0.0), jnp.asarray(0.2), ba + dba, bg + dbg
    )
    dq, dp, dv = imu_ops.bias_corrected_delta(full, dba, dbg)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(exact.delta_p), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(exact.delta_v), atol=2e-3)
    ang = 2 * np.arccos(np.clip(abs(float(jnp.dot(dq, exact.delta_q))), 0, 1))
    assert ang < 2e-4


@pytest.mark.slow
def test_rotation_variance_sets_delta_r_weight():
    """The θ-block variance gives a principled DeltaR cov: grows with window
    length and with gyro noise."""
    short = imu_ops.preintegrate_full(
        _make_batch(20), jnp.asarray(0.0), jnp.asarray(0.1),
        jnp.zeros(3), jnp.zeros(3), gyr_n=GYR_N,
    )
    long = imu_ops.preintegrate_full(
        _make_batch(80), jnp.asarray(0.0), jnp.asarray(0.4),
        jnp.zeros(3), jnp.zeros(3), gyr_n=GYR_N,
    )
    noisy = imu_ops.preintegrate_full(
        _make_batch(20), jnp.asarray(0.0), jnp.asarray(0.1),
        jnp.zeros(3), jnp.zeros(3), gyr_n=5 * GYR_N,
    )
    v = lambda f: float(jnp.trace(f.cov[3:6, 3:6]))
    assert v(long) > 3.5 * v(short)
    assert v(noisy) > 20 * v(short)


@pytest.mark.slow
def test_odometry_preint_cov_mode_tracks():
    """imu_cov_mode='preint' compiles and tracks a short synthetic sequence
    about as well as the reference weighting."""
    import dataclasses
    from rgc_slam_tpu.config import TEST_CONFIG
    from rgc_slam_tpu.io import synthetic
    from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
    from rgc_slam_tpu.models import odometry as odo
    from rgc_slam_tpu.ops import features as F
    import functools

    seq = synthetic.generate_sequence(
        n_scans=12, n_azimuth=360, seed=5, extent=18.0, radius=8.0,
        noise=0.004, closes_loop=False, speed=2.0,
    )

    def run(cfg):
        state = odo.OdometryState.init(cfg)

        @jax.jit
        def step(state, cloud, imu, stamp):
            fx = F.extract_features(cloud, cfg)
            return odo.odometry_step(state, fx, imu, stamp, cfg)

        est = []
        for k, scan in enumerate(seq["scans"]):
            cloud = cloud_from_scan_dict(scan, cfg)
            t_imu, acc, gyr = seq["imu"][k]
            imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
            state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32))
            est.append(np.asarray(out.t_w))
        return np.stack(est)

    base = TEST_CONFIG
    est_ref = run(base)
    est_pre = run(dataclasses.replace(base, imu_cov_mode="preint"))
    assert np.all(np.isfinite(est_pre))
    # both modes must land near each other on clean synthetic IMU
    assert np.linalg.norm(est_pre[-1] - est_ref[-1]) < 0.5
