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
import pytest
import jax
import jax.numpy as jnp

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
from rgc_slam_tpu.models.slam import SlamState, slam_step
from rgc_slam_tpu.types import ImuBatch

CFG = TEST_CONFIG

# full-tier only: every test here drives the full engine for dozens of
# scans (50-143 s each on the 1-core host)
pytestmark = pytest.mark.slow


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


def test_out_of_order_and_duplicate_imu_stamps():
    """Out-of-order and duplicated IMU timestamps (driver re-delivery /
    clock skew): dt can be zero or negative sample-to-sample.  The filter
    and preintegration must stay finite and keep tracking — the reference's
    handler trusts msg ordering and integrates whatever dt falls out, so
    the engine must at minimum never NaN."""
    seq = synthetic.generate_sequence(
        n_scans=7, n_azimuth=240, seed=33, extent=16.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    state = SlamState.init(CFG)
    step = jax.jit(functools.partial(slam_step, cfg=CFG))
    for k, scan in enumerate(seq["scans"]):
        cloud = cloud_from_scan_dict(scan, CFG)
        t_imu, acc, gyr = seq["imu"][k]
        if k == 2:          # duplicate stamps: every sample delivered twice
            t_imu = np.repeat(t_imu[: len(t_imu) // 2], 2)
            acc = np.repeat(acc[: len(acc) // 2], 2, axis=0)
            gyr = np.repeat(gyr[: len(gyr) // 2], 2, axis=0)
        if k == 4:          # out-of-order: swap interior pairs
            idx = np.arange(len(t_imu))
            idx[1:-1:2], idx[2:-1:2] = idx[2:-1:2].copy(), idx[1:-1:2].copy()
            t_imu, acc, gyr = t_imu[idx], acc[idx], gyr[idx]
        imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
        state, out = step(state, cloud, imu,
                          jnp.asarray(seq["stamps"][k], jnp.float32))
        assert _finite_state(state), f"state poisoned at scan {k}"
        assert np.isfinite(np.asarray(out.t_map)).all(), f"output NaN at {k}"


def test_backwards_scan_stamps():
    """A scan stamp that goes BACKWARDS (bag replay loop / clock reset):
    frame_dt <= 0 must not blow up the velocity/deskew math."""
    seq = synthetic.generate_sequence(
        n_scans=6, n_azimuth=240, seed=34, extent=16.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    state = SlamState.init(CFG)
    step = jax.jit(functools.partial(slam_step, cfg=CFG))
    stamps = [0.1, 0.2, 0.3, 0.15, 0.15, 0.5]   # backwards + duplicate
    for k, scan in enumerate(seq["scans"]):
        cloud = cloud_from_scan_dict(scan, CFG)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
        state, out = step(state, cloud, imu, jnp.asarray(stamps[k], jnp.float32))
        assert _finite_state(state), f"state poisoned at scan {k}"
        assert np.isfinite(np.asarray(out.t_map)).all(), f"output NaN at {k}"


def test_all_ground_scan():
    """A scan where (almost) every point is ground (open field, sensor
    tipped down): corner/surf features collapse to near-zero and the ground
    PCA sees the whole cloud.  The mapping skip gate (corner>10 & surf>50)
    must hold the pose instead of solving an empty problem."""
    from rgc_slam_tpu.io.synthetic import World

    # a world that is ONLY floor — no walls, no boxes
    world = World(
        boxes=np.zeros((0, 6)), box_albedo=np.zeros((0,)),
        cylinders=np.zeros((0, 4)), cyl_albedo=np.zeros((0,)),
    )
    state = SlamState.init(CFG)
    step = jax.jit(functools.partial(slam_step, cfg=CFG))
    rng = np.random.default_rng(3)
    for k in range(4):
        scan = synthetic.cast_scan(
            world, np.eye(3), np.array([0.1 * k, 0.0, 0.56]),
            n_rings=16, n_azimuth=240, rng=rng, noise=0.004,
        )
        cloud = cloud_from_scan_dict(scan, CFG)
        m = CFG.max_imu
        imu = ImuBatch(
            t=jnp.asarray(0.1 * k + 0.005 * np.arange(m), jnp.float32),
            acc=jnp.tile(jnp.asarray([0, 0, 9.81], jnp.float32), (m, 1)),
            gyr=jnp.zeros((m, 3), jnp.float32),
            mask=jnp.ones((m,), bool),
        )
        state, out = step(state, cloud, imu, jnp.asarray(0.1 * (k + 1), jnp.float32))
        assert _finite_state(state), f"state poisoned at scan {k}"
        assert np.isfinite(np.asarray(out.t_map)).all(), f"output NaN at {k}"
        # ground must actually be seen
        if k > 0:
            assert bool(state.odo.ground_last.valid)


def test_fleet_zero_feature_robot():
    """Fleet vmap with ONE robot feeding empty scans: the batched mapping
    skip gate (mapping.py do_opt) must hold that robot's pose without
    corrupting its neighbors — the vmapped analog of the B=1 skip gate."""
    from rgc_slam_tpu.parallel import fleet
    import dataclasses

    cfg = dataclasses.replace(CFG, inline_compaction=False)
    B = 3
    seq = synthetic.generate_sequence(
        n_scans=5, n_azimuth=240, seed=35, extent=16.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    states = fleet.fleet_init(cfg, B)
    fstep = jax.jit(functools.partial(fleet.fleet_step, cfg=cfg))
    ref_states = SlamState.init(cfg)
    ref_step = jax.jit(functools.partial(slam_step, cfg=cfg))
    for k, scan in enumerate(seq["scans"]):
        cloud = cloud_from_scan_dict(scan, cfg)
        dead = cloud.replace(mask=jnp.zeros_like(cloud.mask))
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
        cb = jax.tree.map(
            lambda a, b: jnp.stack([a, b, a]), cloud, dead
        )  # robot 1 is the dead one
        ib = jax.tree.map(lambda a: jnp.stack([a] * B), imu)
        sb = jnp.full((B,), seq["stamps"][k], jnp.float32)
        states, outs = fstep(states, cb, ib, sb)
        ref_states, ref_out = ref_step(
            ref_states, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32)
        )
        tm = np.asarray(outs.t_map)
        assert np.isfinite(tm).all(), f"fleet output NaN at scan {k}"
        # healthy robots must track exactly like the B=1 run
        np.testing.assert_allclose(tm[0], np.asarray(ref_out.t_map), atol=1e-5)
        np.testing.assert_allclose(tm[2], np.asarray(ref_out.t_map), atol=1e-5)
        # the dead robot's pose must stay held (skip gate), not explode
        assert np.linalg.norm(tm[1]) < 1.0, f"dead robot ran away: {tm[1]}"


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
