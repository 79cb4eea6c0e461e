"""extract_features_sp (block-sharded feature front-end) vs the replicated
path on the virtual sp mesh.

Feature masks must match EXACTLY: the sp path computes the same window ops
on the same operands (the ±_HALO strip is sliced from replicated arrays)
and the picker runs replicated on the gathered per-point arrays.  Float
diagnostics compare at compile-variant fp tolerance: the strip shapes
compile separately, XLA contracts FMAs differently per compilation, and
the curvature window is a cancellation (sum of 11 near-equal terms), so
~1e-3 relative noise on near-zero curvatures is expected (measured: masks
identical, max curvature delta 2.7e-3 on a 0.046 value).  The GroundPlane
moment sums additionally psum-reassociate.  Context: PARITY §sp round-5
probe — the 131k-point dense
feature stage clears the dispatch floor 8.9x, justifying this path for
single-stream 128-beam-class deployments (reference analog: the OpenMP
point loops, scanRegistration.cpp:233-306).
"""
import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict
from rgc_slam_tpu.ops import features as F


def _cloud(rng, cfg):
    world = synthetic.default_world(seed=3, extent=18.0)
    scan = synthetic.cast_scan(
        world, np.eye(3), np.array([0.3, -0.2, 0.56]),
        n_rings=cfg.n_scans, n_azimuth=220, rng=rng, noise=0.01,
    )
    return cloud_from_scan_dict(scan, cfg)


def _sp_extract(cfg, cloud):
    mesh = Mesh(np.array(jax.devices()[: cfg.sp_shards]), axis_names=("sp",))
    fn = jax.jit(
        jax.shard_map(
            functools.partial(F.extract_features_sp, cfg=cfg),
            mesh=mesh, in_specs=P(), out_specs=P(),
        )
    )
    return fn(cloud)


@pytest.mark.parametrize("n_sp", [2, 4])
def test_features_sp_matches_replicated(rng, n_sp):
    cfg = dataclasses.replace(
        TEST_CONFIG, psum_axis="sp", sp_shards=n_sp, sp_features=True
    )
    cloud = _cloud(rng, cfg)
    ref = jax.jit(functools.partial(F.extract_features, cfg=TEST_CONFIG))(cloud)
    got = _sp_extract(cfg, cloud)

    # feature picks + compaction: exact masks (identical operands; any
    # threshold crossing would flip a mask bit, none do on this fixed seed)
    for name in ("sharp", "flat", "inten"):
        a, b = getattr(ref, name), getattr(got, name)
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_allclose(
            np.asarray(a.xyz), np.asarray(b.xyz), rtol=0, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(a.confidence), np.asarray(b.confidence), rtol=0, atol=1e-5
        )
    np.testing.assert_array_equal(
        np.asarray(ref.ground_mask), np.asarray(got.ground_mask)
    )
    # compile-variant FMA noise under the curvature cancellation (see module
    # docstring): tolerance is loose in absolute terms, tight vs the 0.1
    # pick thresholds
    np.testing.assert_allclose(
        np.asarray(ref.curvature), np.asarray(got.curvature), rtol=1e-3, atol=5e-3
    )
    # block-sliced covariance queries gather from the same full operands
    np.testing.assert_allclose(
        np.asarray(ref.normals_cov), np.asarray(got.normals_cov),
        rtol=1e-4, atol=1e-5,
    )
    # ground plane: psum reassociation of the moment sums
    np.testing.assert_allclose(
        np.asarray(ref.ground.normal), np.asarray(got.ground.normal), atol=1e-4
    )
    np.testing.assert_allclose(
        float(ref.ground.distance), float(got.ground.distance), atol=1e-4
    )
    assert bool(ref.ground.valid) == bool(got.ground.valid)


def test_features_sp_rbf_covariances(rng):
    """The rbf (G8) covariance path must also block-slice correctly."""
    cfg = dataclasses.replace(
        TEST_CONFIG, psum_axis="sp", sp_shards=2, sp_features=True,
        cov_estimation="rbf",
    )
    cloud = _cloud(rng, cfg)
    ref = jax.jit(
        functools.partial(
            F.extract_features, cfg=dataclasses.replace(TEST_CONFIG, cov_estimation="rbf")
        )
    )(cloud)
    got = _sp_extract(cfg, cloud)
    np.testing.assert_allclose(
        np.asarray(ref.normals_cov), np.asarray(got.normals_cov),
        rtol=1e-4, atol=1e-5,
    )


def test_sp_features_requires_divisible_caps():
    with pytest.raises(ValueError, match="max_points"):
        dataclasses.replace(
            TEST_CONFIG, psum_axis="sp", sp_shards=2, sp_features=True,
            max_points=4095,
        )


def test_features_sp_rejects_axis_size_mismatch(rng):
    """A mesh axis wider than cfg.sp_shards must raise at trace time — the
    edge devices' clamped slices would otherwise silently double-count
    blocks in the psum gather."""
    cfg = dataclasses.replace(
        TEST_CONFIG, psum_axis="sp", sp_shards=2, sp_features=True
    )
    cloud = _cloud(rng, cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("sp",))
    fn = jax.jit(
        jax.shard_map(
            functools.partial(F.extract_features_sp, cfg=cfg),
            mesh=mesh, in_specs=P(), out_specs=P(),
        )
    )
    with pytest.raises(ValueError, match="sp_shards"):
        fn(cloud)


@pytest.mark.slow
def test_fleet_distributed_step_with_sp_features():
    """sp_features must compose with the dp×sp fleet path: vmapped robots
    inside shard_map, axis_index/psum over the sp mesh axis under vmap.
    Tracks the replicated vmap fleet at the cross-compile tolerance the
    existing dp×sp test uses."""
    from rgc_slam_tpu.parallel import fleet

    assert len(jax.devices()) >= 8
    cfg = dataclasses.replace(TEST_CONFIG, sp_features=True)
    mesh = fleet.make_mesh(4, 2)
    dstep = fleet.make_distributed_step(mesh, cfg)

    from rgc_slam_tpu.io.convert import imu_from_interval

    seq = synthetic.generate_sequence(
        n_scans=3, n_azimuth=120, seed=7, extent=15.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    states_sh = fleet.fleet_init(cfg, 8)
    states_ref = fleet.fleet_init(TEST_CONFIG, 8)
    for k in range(len(seq["scans"])):
        cloud = cloud_from_scan_dict(seq["scans"][k], cfg)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
        stamp = jnp.asarray(seq["stamps"][k], jnp.float32)
        batch = lambda a: jax.tree.map(lambda x: jnp.stack([x] * 8), a)
        bc, bi, bs = batch(cloud), batch(imu), jnp.stack([stamp] * 8)
        states_sh, outs_sh, _ = dstep(states_sh, bc, bi, bs)
        states_ref, outs_ref = fleet.fleet_step(states_ref, bc, bi, bs, TEST_CONFIG)
    np.testing.assert_allclose(
        np.asarray(outs_sh.t_map), np.asarray(outs_ref.t_map), atol=5e-3
    )


def test_features_sp_degenerate_scans(rng):
    """The sp path must stay finite on glitch inputs, like the replicated
    front-end (tests/test_robustness.py): an all-masked scan (total dropout)
    and NaN xyz in MASKED slots (uninitialized driver memory) must produce
    finite feature outputs with empty/unchanged masks on every device."""
    cfg = dataclasses.replace(
        TEST_CONFIG, psum_axis="sp", sp_shards=2, sp_features=True
    )
    cloud = _cloud(rng, cfg)

    # all-masked
    empty = cloud.replace(mask=jnp.zeros_like(cloud.mask))
    fx = _sp_extract(cfg, empty)
    assert not bool(jnp.any(fx.sharp.mask))
    assert not bool(jnp.any(fx.flat.mask))
    assert not bool(fx.ground.valid)
    assert np.isfinite(np.asarray(fx.normals_cov)).all()

    # NaN garbage confined to masked slots
    garbage = cloud.replace(
        xyz=jnp.where(cloud.mask[:, None], cloud.xyz, jnp.nan)
    )
    ref = jax.jit(functools.partial(F.extract_features, cfg=TEST_CONFIG))(
        cloud.replace(xyz=jnp.where(cloud.mask[:, None], cloud.xyz, jnp.nan))
    )
    got = _sp_extract(cfg, garbage)
    np.testing.assert_array_equal(
        np.asarray(ref.sharp.mask), np.asarray(got.sharp.mask)
    )
    assert np.isfinite(
        np.asarray(got.sharp.xyz)[np.asarray(got.sharp.mask)]
    ).all()


def test_fleet_sp_features_indivisible_falls_back():
    """The sp plan's fallbacks must be independent: an indivisible
    max_points disables ONLY the sp feature front-end, keeping the
    registration/mapping block sharding its own caps allow; indivisible
    registration caps drop to stride masking without raising."""
    from rgc_slam_tpu.parallel import fleet

    # max_points indivisible -> sp_features off, registration sharding kept
    cfg = dataclasses.replace(TEST_CONFIG, sp_features=True, max_points=4095)
    plan = fleet._sp_plan(cfg, 2)
    assert plan.sp_shards == 2 and not plan.sp_features

    # everything divisible -> both on
    plan = fleet._sp_plan(dataclasses.replace(TEST_CONFIG, sp_features=True), 2)
    assert plan.sp_shards == 2 and plan.sp_features

    # registration caps indivisible -> stride masking, features off too
    cfg = dataclasses.replace(TEST_CONFIG, sp_features=True, max_kf_corner=127)
    plan = fleet._sp_plan(cfg, 2)
    assert plan.sp_shards == 1 and not plan.sp_features

    # construction must not raise in any of these modes
    mesh = fleet.make_mesh(4, 2)
    fleet.make_distributed_step(
        mesh, dataclasses.replace(TEST_CONFIG, sp_features=True, max_points=4095)
    )


@pytest.mark.slow
def test_slam_step_with_sp_features(rng):
    """End-to-end wiring: slam_step with sp_features on an sp mesh must
    compile, run, and track the replicated slam_step."""
    from rgc_slam_tpu.io.convert import imu_from_interval
    from rgc_slam_tpu.models.slam import SlamState, slam_step

    cfg = dataclasses.replace(
        TEST_CONFIG, psum_axis="sp", sp_shards=2, sp_features=True
    )
    seq = synthetic.generate_sequence(
        n_scans=3, n_azimuth=120, seed=7, extent=15.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("sp",))
    sp_step = jax.jit(
        jax.shard_map(
            functools.partial(slam_step, cfg=cfg),
            mesh=mesh, in_specs=P(), out_specs=P(),
        )
    )
    ref_step = jax.jit(functools.partial(slam_step, cfg=TEST_CONFIG))
    s_sp = SlamState.init(cfg)
    s_ref = SlamState.init(TEST_CONFIG)
    for k in range(len(seq["scans"])):
        cloud = cloud_from_scan_dict(seq["scans"][k], cfg)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
        stamp = jnp.asarray(seq["stamps"][k], jnp.float32)
        s_sp, out_sp = sp_step(s_sp, cloud, imu, stamp)
        s_ref, out_ref = ref_step(s_ref, cloud, imu, stamp)
    np.testing.assert_allclose(
        np.asarray(out_sp.t_map), np.asarray(out_ref.t_map), atol=1e-4
    )
