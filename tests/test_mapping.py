import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
from rgc_slam_tpu.models.slam import SlamState, slam_step
from rgc_slam_tpu.utils.evaluation import ate_rmse

CFG = TEST_CONFIG


@pytest.fixture(scope="module")
def seq():
    return synthetic.generate_sequence(
        n_scans=31, n_azimuth=360, seed=5, extent=18.0, radius=8.0,
        noise=0.004, motion_distortion=True, closes_loop=False, speed=2.0,
    )


@pytest.fixture(scope="module")
def run(seq):
    import functools

    state = SlamState.init(CFG)
    step = jax.jit(functools.partial(slam_step, cfg=CFG))
    est_map, est_odom, kf_flags = [], [], []
    for k, scan in enumerate(seq["scans"]):
        cloud = cloud_from_scan_dict(scan, CFG)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
        state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32))
        est_map.append(np.asarray(out.t_map))
        est_odom.append(np.asarray(out.t_odom))
        kf_flags.append(bool(out.kf_added))
    return state, np.stack(est_map), np.stack(est_odom), kf_flags


def test_mapping_improves_or_matches_odometry(seq, run):
    state, est_map, est_odom, _ = run
    gt = np.stack([t for (_, t) in seq["poses"]])
    ate_map = ate_rmse(est_map, gt)
    ate_odo = ate_rmse(est_odom, gt)
    assert ate_map < 0.1, f"mapped ATE {ate_map:.3f} (odom {ate_odo:.3f})"
    assert ate_map < ate_odo * 1.5 + 0.02, (
        f"mapping should not degrade odometry: {ate_map:.3f} vs {ate_odo:.3f}"
    )


def test_keyframes_accumulate(seq, run):
    state, _, _, kf_flags = run
    n_kf = int(state.mapping.kf_count)
    assert kf_flags[0], "first frame must become a keyframe"
    assert 3 <= n_kf <= len(seq["scans"])
    # keyframe spacing should respect the 0.5 m / 0.3 rad gate
    kt = np.asarray(state.mapping.kf_t[:n_kf])
    gaps = np.linalg.norm(np.diff(kt, axis=0), axis=1)
    assert (gaps > 0.3).all(), f"keyframe gaps too small: {gaps}"


def test_travel_distance_monotone(run):
    state, _, _, _ = run
    n_kf = int(state.mapping.kf_count)
    tr = np.asarray(state.mapping.kf_travel[:n_kf])
    assert (np.diff(tr) > 0).all()
