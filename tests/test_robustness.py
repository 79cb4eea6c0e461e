"""Degenerate-input robustness of the full step (SURVEY §5.3 analog).

The reference's callbacks tolerate sensor glitches — dropped sweeps, empty
point clouds after the range filter, IMU gaps (RGC_odometer.cpp guards its
queues; scanRegistration publishes whatever survives the gates).  The
static-shape engine must do the same through masks: an all-masked scan, NaN
garbage in masked-out slots, or an empty IMU batch mid-run must neither
crash nor poison subsequent tracking (masked-gather NaN leaks are the
classic failure, see ops/covariance.eigh3x3's floor note).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
from rgc_slam_tpu.models.slam import SlamState, slam_step
from rgc_slam_tpu.types import ImuBatch

CFG = TEST_CONFIG


def _finite_state(state) -> bool:
    # poses are the load-bearing leaves — NaN anywhere else is tolerable
    # (masked padding), but a poisoned pose corrupts everything downstream
    return (
        np.isfinite(np.asarray(state.odo.q_w)).all()
        and np.isfinite(np.asarray(state.odo.t_w)).all()
        and np.isfinite(np.asarray(state.mapping.q_md)).all()
    )


def test_empty_and_garbage_scans_mid_run():
    """Scan 3 fully masked (glitch/total dropout), scan 4 carries NaN xyz in
    its MASKED slots (uninitialized driver memory): the run must stay finite
    and keep tracking the remaining scans."""
    seq = synthetic.generate_sequence(
        n_scans=9, n_azimuth=240, seed=31, extent=16.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    state = SlamState.init(CFG)
    step = jax.jit(functools.partial(slam_step, cfg=CFG))
    est = []
    for k, scan in enumerate(seq["scans"]):
        cloud = cloud_from_scan_dict(scan, CFG)
        if k == 3:
            cloud = cloud.replace(mask=jnp.zeros_like(cloud.mask))
        if k == 4:
            garbage = jnp.where(
                cloud.mask[:, None], cloud.xyz, jnp.nan
            )
            cloud = cloud.replace(xyz=garbage)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
        state, out = step(state, cloud, imu,
                          jnp.asarray(seq["stamps"][k], jnp.float32))
        assert _finite_state(state), f"state poisoned at scan {k}"
        assert np.isfinite(np.asarray(out.t_map)).all(), f"output NaN at {k}"
        est.append(np.asarray(out.t_map))
    # tracking must resume: final scans move roughly with ground truth
    gt = np.stack([t for (_, t) in seq["poses"]])
    tail_err = np.linalg.norm((est[-1] - est[-3]) - (gt[-1] - gt[-3]))
    assert tail_err < 0.5, f"post-glitch tracking lost ({tail_err:.2f} m)"


def test_empty_imu_batch_mid_run():
    """An empty IMU interval (driver gap) must fall back gracefully — the
    reference predicts with the last attitude when the queue is empty."""
    seq = synthetic.generate_sequence(
        n_scans=6, n_azimuth=240, seed=32, extent=16.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    state = SlamState.init(CFG)
    step = jax.jit(functools.partial(slam_step, cfg=CFG))
    for k, scan in enumerate(seq["scans"]):
        cloud = cloud_from_scan_dict(scan, CFG)
        if k == 2:
            m = CFG.max_imu
            imu = ImuBatch(
                t=jnp.zeros((m,), jnp.float32),
                acc=jnp.zeros((m, 3), jnp.float32),
                gyr=jnp.zeros((m, 3), jnp.float32),
                mask=jnp.zeros((m,), bool),
            )
        else:
            t_imu, acc, gyr = seq["imu"][k]
            imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
        state, out = step(state, cloud, imu,
                          jnp.asarray(seq["stamps"][k], jnp.float32))
        assert np.isfinite(np.asarray(out.t_map)).all(), f"output NaN at {k}"
        assert np.isfinite(np.asarray(state.odo.q_w)).all()
