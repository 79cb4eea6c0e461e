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


# ---------------------------------------------------------------------------
# keyframe-store compaction (long-session eviction, VERDICT r1 item 2)
# ---------------------------------------------------------------------------


def test_compact_keyframe_store_unit():
    from rgc_slam_tpu.models.mapping import MappingState, compact_keyframe_store

    K = CFG.max_keyframes
    ms = MappingState.init(CFG)
    n = K - 4
    xs = np.zeros((K, 3), np.float32)
    xs[:, 0] = np.arange(K) * 0.5
    ms = ms.replace(
        kf_t=jnp.asarray(xs),
        kf_travel=jnp.asarray(np.arange(K, dtype=np.float32) * 0.5),
        kf_stamp=jnp.asarray(np.arange(K, dtype=np.float32)),
        kf_count=jnp.asarray(n, jnp.int32),
    )
    protect = jnp.zeros(K, bool).at[3].set(True)  # an "anchor" in the old half
    ms2, keep, new_of_old = jax.jit(compact_keyframe_store)(ms, protect)
    n2 = int(ms2.kf_count)
    assert n2 < n
    t2 = np.asarray(ms2.kf_t)[:n2]
    tr2 = np.asarray(ms2.kf_travel)[:n2]
    # temporal order preserved (stamps strictly increasing)
    assert (np.diff(np.asarray(ms2.kf_stamp)[:n2]) > 0).all()
    assert (np.diff(tr2) > 0).all()
    # recent half untouched
    half = K // 2
    np.testing.assert_array_equal(t2[-(n - (n - half)):], xs[n - half:n])
    # protected keyframe survived
    assert 1.5 in t2[:, 0].tolist()
    # new_of_old consistent for every kept keyframe
    keep_np = np.asarray(keep)
    noo = np.asarray(new_of_old)
    for i in np.nonzero(keep_np)[0]:
        np.testing.assert_array_equal(t2[noo[i]], xs[i])
    # roughly a quarter evicted
    assert (n - n2) >= (n - half) // 2 - 1


@pytest.mark.slow
def test_eviction_no_loop_long_run():
    """>2x capacity straight drive with loops off: the store compacts instead
    of freezing; the newest keyframe keeps tracking the robot."""
    import functools

    cfg = dataclasses.replace(
        CFG, loop_closure_enable=False, max_keyframes=16, keyframe_dist=0.1,
    )
    lseq = synthetic.generate_sequence(
        n_scans=44, n_azimuth=240, seed=5, extent=18.0, radius=8.0,
        noise=0.004, closes_loop=False, speed=2.0,
    )
    state = SlamState.init(cfg)
    step = jax.jit(functools.partial(slam_step, cfg=cfg))
    est, counts = [], []
    for k, scan in enumerate(lseq["scans"]):
        cloud = cloud_from_scan_dict(scan, cfg)
        t_imu, acc, gyr = lseq["imu"][k]
        ib = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
        state, out = step(state, cloud, ib, jnp.asarray(lseq["stamps"][k], jnp.float32))
        est.append(np.asarray(out.t_map))
        counts.append(int(state.mapping.kf_count))
    gt = np.stack([t for (_, t) in lseq["poses"]])
    # ~44 keyframe adds vs capacity 16: compaction must have run
    assert max(counts) <= 16
    assert counts[-1] > 8
    kf_t = np.asarray(state.mapping.kf_t)[: counts[-1]]
    # newest keyframe tracks the robot (store did not freeze at ~16 adds)
    assert np.linalg.norm(kf_t[-1] - est[-1]) < 0.5
    # travel accumulators stay monotone across compactions
    tr = np.asarray(state.mapping.kf_travel)[: counts[-1]]
    assert (np.diff(tr) > 0).all()
    ate = ate_rmse(np.stack(est), gt)
    assert ate < 0.25, f"ATE {ate:.3f} m across compactions"
