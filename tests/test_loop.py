import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
from rgc_slam_tpu.models import loop as loop_mod
from rgc_slam_tpu.models.mapping import MappingState
from rgc_slam_tpu.models.slam import SlamState, slam_step
from rgc_slam_tpu.utils import math3d as m3
from rgc_slam_tpu.utils.evaluation import ate_rmse


def test_icp_point2point_recovers_transform(rng):
    pts = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    yaw = 0.08
    R = np.array([[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]], np.float32)
    t = np.array([0.4, -0.2, 0.1], np.float32)
    tgt = pts @ R.T + t
    q, te, fit, n = loop_mod.icp_point2point(
        jnp.asarray(pts), jnp.ones(500, bool), jnp.asarray(tgt), jnp.ones(500, bool),
        jnp.asarray(3.0), 20,
    )
    R_est = np.asarray(m3.quat_to_mat(q))
    assert np.abs(R_est - R).max() < 1e-3
    assert np.abs(np.asarray(te) - t).max() < 1e-3
    assert float(fit) < 1e-4


def test_pgo_removes_drift():
    """Synthetic chain with linear drift + one exact loop constraint: PGO must
    pull the end of the chain back onto the loop keyframe."""
    cfg = dataclasses.replace(TEST_CONFIG, max_keyframes=64, max_loops=4)
    K = 40
    ms = MappingState.init(cfg)
    # ground truth: straight line in x, yaw 0; estimated: drifting in y + yaw
    gt_t = np.stack([np.arange(K) * 1.0, np.zeros(K), np.zeros(K)], axis=1)
    drift_y = np.linspace(0, 2.0, K)
    est_t = gt_t + np.stack([np.zeros(K), drift_y, np.zeros(K)], axis=1)
    est_yaw = np.linspace(0, 0.1, K)
    q = np.asarray(m3.ypr_to_quat(jnp.asarray(
        np.stack([est_yaw, np.zeros(K), np.zeros(K)], axis=1), jnp.float32)))
    ms = ms.replace(
        kf_q=ms.kf_q.at[:K].set(q),
        kf_t=ms.kf_t.at[:K].set(jnp.asarray(est_t, jnp.float32)),
        kf_count=jnp.asarray(K, jnp.int32),
        kf_travel=ms.kf_travel.at[:K].set(jnp.arange(K, dtype=jnp.float32)),
    )
    ls = loop_mod.LoopState.init(cfg)
    # loop: keyframe 39 should coincide with gt relative pose from kf 12
    i, j = K - 1, 12
    rel_t = jnp.asarray(gt_t[i] - gt_t[j], jnp.float32)  # frame j has yaw 0 in gt
    ls = ls.replace(
        loop_i=ls.loop_i.at[0].set(i),
        loop_j=ls.loop_j.at[0].set(j),
        loop_t=ls.loop_t.at[0].set(rel_t),
        loop_count=jnp.asarray(1, jnp.int32),
    )
    state = SlamState.init(cfg).replace(mapping=ms)
    state2, ran = loop_mod._pose_graph_optimize(state, ls, jnp.asarray(True), cfg)
    kf_t2 = np.asarray(state2.mapping.kf_t[:K])
    kf_q2 = np.asarray(state2.mapping.kf_q[:K])

    def loop_err(ts, yaws):
        # the 4-DoF loop residual lives in keyframe j's frame
        c, s = np.cos(yaws[j]), np.sin(yaws[j])
        Rj = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        return np.linalg.norm(Rj.T @ (ts[i] - ts[j]) - np.asarray(rel_t))

    end_err_before = loop_err(est_t, est_yaw)
    yaw2 = np.array(
        [float(m3.quat_to_ypr(jnp.asarray(qq))[0]) for qq in kf_q2]
    )
    end_err_after = loop_err(kf_t2, yaw2)
    assert end_err_after < 0.1 * end_err_before + 0.05, (
        f"loop error {end_err_before:.2f} -> {end_err_after:.2f}"
    )
    # pinned keyframe must not move
    np.testing.assert_allclose(kf_t2[12], est_t[12], atol=1e-3)


def test_loop_slot_eviction_policy():
    """Loop-store eviction (PARITY.md §loop-store): empty slots fill first
    (lowest index), then the oldest-stamped loop is evicted — except the slot
    holding the PGO gauge anchor (smallest loop_j), which is never
    overwritten once the store wraps."""
    cfg = dataclasses.replace(TEST_CONFIG, max_loops=4)
    ls = loop_mod.LoopState.init(cfg)
    # empty store -> slot 0
    assert int(loop_mod.choose_loop_slot(ls)) == 0
    # partially filled (slots 0,1 used; 2,3 empty) -> first empty = 2
    ls = ls.replace(
        loop_i=ls.loop_i.at[:2].set(jnp.array([30, 40], jnp.int32)),
        loop_j=ls.loop_j.at[:2].set(jnp.array([5, 12], jnp.int32)),
        loop_stamp=ls.loop_stamp.at[:2].set(jnp.array([1, 2], jnp.int32)),
        loop_count=jnp.asarray(2, jnp.int32),
    )
    assert int(loop_mod.choose_loop_slot(ls)) == 2
    # full store: oldest stamp is slot 0, but slot 0 holds the anchor
    # (min loop_j=5) -> evict the next-oldest non-anchor slot, slot 1
    ls = ls.replace(
        loop_i=jnp.array([30, 40, 50, 60], jnp.int32),
        loop_j=jnp.array([5, 12, 20, 33], jnp.int32),
        loop_stamp=jnp.array([1, 2, 3, 4], jnp.int32),
        loop_count=jnp.asarray(4, jnp.int32),
    )
    assert int(loop_mod.choose_loop_slot(ls)) == 1
    # anchor elsewhere: slot 2 holds min loop_j; oldest non-anchor is slot 0
    ls = ls.replace(loop_j=jnp.array([15, 12, 3, 33], jnp.int32))
    assert int(loop_mod.choose_loop_slot(ls)) == 0
    # compaction freed a slot (loop dropped -> -1): reuse it before evicting
    ls = ls.replace(loop_i=ls.loop_i.at[3].set(-1))
    assert int(loop_mod.choose_loop_slot(ls)) == 3


CIRCLE_CFG = dataclasses.replace(
    TEST_CONFIG, max_keyframes=160, loop_submap_halfwidth=25,
    max_loop_submap_points=8192, loop_icp_iterations=60,
    # denser keyframe clouds than the unit-test defaults: the loop ICP
    # fitness floor scales with cloud sparsity (the reference keeps
    # full-resolution feature clouds per keyframe)
    max_kf_corner=256, max_kf_surf=1024, max_sharp_total=1024,
    max_flat_total=2048,
    # synthetic clouds remain sparser than real sensor data, so the
    # point-to-point fitness floor sits above the reference's 0.1 gate
    loop_fitness_thresh=0.15,
)


@pytest.mark.slow
def test_loop_closure_end_to_end():
    """Closed-circle sequence: a loop must be detected and PGO must reduce the
    keyframe trajectory error."""
    cfg = CIRCLE_CFG
    n_scans = 210
    seq = synthetic.generate_sequence(
        n_scans=n_scans, n_azimuth=240, seed=11, extent=22.0, radius=9.0,
        noise=0.004, motion_distortion=True, closes_loop=True, laps=1.25,
    )
    state = SlamState.init(cfg)
    lstate = loop_mod.LoopState.init(cfg)
    step = jax.jit(functools.partial(slam_step, cfg=cfg))
    loop_step = jax.jit(functools.partial(loop_mod.loop_closure_step, cfg=cfg))
    est = []
    accepted_any = False
    for k, scan in enumerate(seq["scans"]):
        cloud = cloud_from_scan_dict(scan, cfg)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
        state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32))
        est.append(np.asarray(out.t_map))
        if (k + 1) % 5 == 0:
            state, lstate, info = loop_step(state, lstate)
            accepted_any = accepted_any or bool(info.accepted)
    gt = np.stack([t for (_, t) in seq["poses"]])
    est = np.stack(est)
    ate = ate_rmse(est, gt)
    n_loops = int(lstate.loop_count)
    assert accepted_any and n_loops >= 1, "no loop closure detected on a closed circle"
    # keyframe trajectory after PGO should be globally consistent
    n_kf = int(state.mapping.kf_count)
    kf_t = np.asarray(state.mapping.kf_t[:n_kf])
    kf_stamps = np.asarray(state.mapping.kf_stamp[:n_kf])
    stamp_arr = np.asarray(seq["stamps"], dtype=np.float32)
    gt_at_kf = np.stack(
        [gt[int(np.argmin(np.abs(stamp_arr - s)))] for s in kf_stamps]
    )
    kf_ate = ate_rmse(kf_t, gt_at_kf)
    # PGO distributes the accumulated drift; on this fast (3.3 m/s, 21 deg/s)
    # low-res sequence the no-loop keyframe ATE is ~1.8 m — closing loops must
    # bring it down meaningfully
    assert kf_ate < 1.5, f"post-PGO keyframe ATE {kf_ate:.3f} m ({n_loops} loops)"


@pytest.mark.slow
def test_loop_gicp_method_compiles():
    """loop_icp_method='gicp' must compile and no-op safely with no candidates."""
    cfg = dataclasses.replace(TEST_CONFIG, loop_icp_method="gicp")
    state = SlamState.init(cfg)
    ls = loop_mod.LoopState.init(cfg)
    state2, ls2, info = jax.jit(
        functools.partial(loop_mod.loop_closure_step, cfg=cfg)
    )(state, ls)
    assert not bool(info.accepted)
    assert int(ls2.loop_count) == 0


@pytest.mark.slow
def test_loops_survive_keyframe_compaction():
    """VERDICT r1 item 2 'done' criterion (scaled down): drive past 1.4x
    keyframe capacity on a closed course — the store must compact (not
    freeze), loops must still be detected and close after saturation, and the
    post-PGO keyframe trajectory must stay globally consistent."""
    cfg = dataclasses.replace(
        CIRCLE_CFG, max_keyframes=72,
        # compaction halves old-submap density; point-to-point fitness is
        # mean squared NN distance, so its floor rises with sparsity on
        # these test-size clouds (full-size keyframe clouds keep the
        # reference 0.1 gate viable - see PARITY.md)
        loop_fitness_thresh=0.25,
    )
    n_scans = 210
    seq = synthetic.generate_sequence(
        n_scans=n_scans, n_azimuth=240, seed=11, extent=22.0, radius=9.0,
        noise=0.004, motion_distortion=True, closes_loop=True, laps=1.25,
    )
    state = SlamState.init(cfg)
    lstate = loop_mod.LoopState.init(cfg)
    step = jax.jit(functools.partial(slam_step, cfg=cfg))
    loop_step = jax.jit(functools.partial(loop_mod.loop_closure_step, cfg=cfg))
    est, total_adds, max_count = [], 0, 0
    accepted_after_compact = False
    compacted = False
    for k, scan in enumerate(seq["scans"]):
        cloud = cloud_from_scan_dict(scan, cfg)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
        state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32))
        est.append(np.asarray(out.t_map))
        total_adds += int(out.kf_added)
        if (k + 1) % 5 == 0:
            before = int(state.mapping.kf_count)
            state, lstate, info = loop_step(state, lstate)
            after_c = int(state.mapping.kf_count)
            if after_c < before:
                compacted = True
            if compacted and bool(info.accepted):
                accepted_after_compact = True
        max_count = max(max_count, int(state.mapping.kf_count))
    assert total_adds > cfg.max_keyframes, "scenario must overflow capacity"
    assert max_count <= cfg.max_keyframes
    assert compacted, "compaction never triggered"
    assert accepted_after_compact, "no loop accepted after compaction"
    # loop store indices stayed valid: every surviving loop references
    # in-range keyframes with matching travel ordering
    n_kf = int(state.mapping.kf_count)
    li = np.asarray(lstate.loop_i)
    lj = np.asarray(lstate.loop_j)
    ok = li >= 0
    assert (li[ok] < n_kf).all() and (lj[ok] < n_kf).all()
    assert (lj[ok] < li[ok]).all(), "loop anchor must predate the closing keyframe"
    gt = np.stack([t for (_, t) in seq["poses"]])
    kf_t = np.asarray(state.mapping.kf_t[:n_kf])
    kf_stamps = np.asarray(state.mapping.kf_stamp[:n_kf])
    stamp_arr = np.asarray(seq["stamps"], dtype=np.float32)
    gt_at_kf = np.stack(
        [gt[int(np.argmin(np.abs(stamp_arr - s)))] for s in kf_stamps]
    )
    kf_ate = ate_rmse(kf_t, gt_at_kf)
    assert kf_ate < 1.5, f"post-PGO keyframe ATE {kf_ate:.3f} m after compaction"
