import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
from rgc_slam_tpu.parallel import fleet
from rgc_slam_tpu.models.slam import SlamState, slam_step

CFG = TEST_CONFIG


def _inputs(n_robots, n_steps=3):
    seq = synthetic.generate_sequence(
        n_scans=n_steps + 1, n_azimuth=120, seed=7, extent=15.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    steps = []
    for k in range(len(seq["scans"])):
        cloud = cloud_from_scan_dict(seq["scans"][k], CFG)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
        stamp = jnp.asarray(seq["stamps"][k], jnp.float32)
        batch = lambda a: jax.tree.map(lambda x: jnp.stack([x] * n_robots), a)
        steps.append((batch(cloud), batch(imu), jnp.stack([stamp] * n_robots)))
    return steps


@pytest.mark.slow
def test_vmap_fleet_matches_single():
    """A fleet of identical robots must produce identical per-robot results,
    equal to the single-robot path."""
    steps = _inputs(4, n_steps=2)
    states = fleet.fleet_init(CFG, 4)
    single = SlamState.init(CFG)
    sstep = jax.jit(functools.partial(slam_step, cfg=CFG))
    for cloud, imu, stamps in steps:
        states, outs = fleet.fleet_step(states, cloud, imu, stamps, CFG)
        single, sout = sstep(
            jax.tree.map(lambda a: a, single),
            jax.tree.map(lambda a: a[0], cloud),
            jax.tree.map(lambda a: a[0], imu),
            stamps[0],
        )
    tm = np.asarray(outs.t_map)
    np.testing.assert_allclose(tm[0], tm[1], atol=1e-6)
    np.testing.assert_allclose(tm[0], np.asarray(sout.t_map), atol=1e-4)


@pytest.mark.slow
def test_sharded_fleet_on_virtual_mesh():
    """dp×sp shard_map must compile, run, and agree with the vmap fleet."""
    n_dev = len(jax.devices())
    assert n_dev >= 8, f"expected 8 virtual devices, got {n_dev}"
    mesh = fleet.make_mesh(4, 2)
    dstep = fleet.make_distributed_step(mesh, CFG)
    steps = _inputs(8, n_steps=2)
    states_sh = fleet.fleet_init(CFG, 8)
    states_ref = fleet.fleet_init(CFG, 8)
    for cloud, imu, stamps in steps:
        states_sh, outs_sh, mean_fit = dstep(states_sh, cloud, imu, stamps)
        states_ref, outs_ref = fleet.fleet_step(states_ref, cloud, imu, stamps, CFG)
    np.testing.assert_allclose(
        np.asarray(outs_sh.t_map), np.asarray(outs_ref.t_map), atol=5e-3
    )
    assert np.isfinite(float(mean_fit))
    np.testing.assert_allclose(
        float(mean_fit), float(np.mean(np.asarray(outs_ref.fitness))), atol=1e-3
    )


def test_compact_fleet_evicts_only_at_capacity():
    """compact_fleet must thin robots whose store is within COMPACT_MARGIN
    of capacity and leave under-capacity robots bit-exact."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rgc_slam_tpu.config import TEST_CONFIG
    from rgc_slam_tpu.models.mapping import COMPACT_MARGIN
    from rgc_slam_tpu.parallel import fleet as fl

    cfg = dataclasses.replace(TEST_CONFIG, max_keyframes=64)
    B = 3
    states = fl.fleet_init(cfg, B)
    K = cfg.max_keyframes
    # robot 0: nearly full (triggers), robot 1: below the margin, robot 2:
    # empty.  (Eviction thins the oldest half, so capacity must exceed
    # 2*COMPACT_MARGIN for the thinning to bite — real capacities are >=128.)
    counts = jnp.asarray([K - 2, K - COMPACT_MARGIN - 1, 0], jnp.int32)
    kf_t = jnp.tile(
        jnp.arange(K, dtype=jnp.float32)[None, :, None], (B, 1, 3)
    )
    ms = states.mapping.replace(
        kf_count=counts, kf_t=kf_t,
        kf_travel=jnp.tile(jnp.arange(K, dtype=jnp.float32)[None], (B, 1)),
    )
    states = states.replace(mapping=ms)
    out = jax.jit(fl.compact_fleet)(states)
    c = np.asarray(out.mapping.kf_count)
    assert c[0] < K - 2, "full robot must be compacted"
    assert c[1] == K - COMPACT_MARGIN - 1 and c[2] == 0, \
        "under-capacity robots must not change"
    np.testing.assert_array_equal(
        np.asarray(out.mapping.kf_t[1]), np.asarray(kf_t[1])
    )


def test_chunk_exceeding_margin_rejected():
    import pytest
    from rgc_slam_tpu.config import TEST_CONFIG
    from rgc_slam_tpu.models.mapping import COMPACT_MARGIN
    from rgc_slam_tpu.models.slam import SlamSystem

    with pytest.raises(ValueError, match="COMPACT_MARGIN"):
        SlamSystem(TEST_CONFIG, enable_loop=False, chunk=COMPACT_MARGIN + 1)
