"""CLI runner + KITTI ingestion."""
import json
import os

import numpy as np
import pytest

from rgc_slam_tpu.io import kitti, synthetic


def test_kitti_bin_roundtrip(tmp_path, rng):
    raw = rng.uniform(-20, 20, (5000, 4)).astype(np.float32)
    raw[:, 3] = rng.random(5000)
    p = tmp_path / "000000.bin"
    raw.tofile(p)
    back = kitti.read_velodyne_bin(str(p))
    np.testing.assert_array_equal(back, raw)


@pytest.mark.slow
def test_kitti_sequence_runs(tmp_path):
    """Synthesize 64-beam scans into KITTI .bin files, run them through the
    KittiSequence -> SLAM pipeline."""
    import dataclasses
    import functools
    import jax
    import jax.numpy as jnp
    from rgc_slam_tpu.config import TEST_CONFIG
    from rgc_slam_tpu.models.slam import SlamState, slam_step

    world = synthetic.default_world(3, extent=18.0)
    vdir = tmp_path / "velodyne"
    vdir.mkdir()
    rng = np.random.default_rng(0)
    for k in range(3):
        t = np.array([0.3 * k, 0.0, 1.73])
        scan = synthetic.cast_scan(world, np.eye(3), t, n_rings=64,
                                   n_azimuth=240, rng=rng, noise=0.005)
        m = scan["mask"]
        raw = np.concatenate(
            [scan["xyz"][m], (scan["intensity"][m] / 255.0)[:, None]], axis=1
        ).astype(np.float32)
        raw.tofile(vdir / f"{k:06d}.bin")

    cfg = dataclasses.replace(
        TEST_CONFIG, n_scans=64, use_imu=False, use_ground=False,
        lidar_height=1.73, max_points=16384,
    )
    seq = kitti.KittiSequence(str(vdir), cfg)
    assert len(seq) == 3
    state = SlamState.init(cfg)
    step = jax.jit(functools.partial(slam_step, cfg=cfg))
    for item in seq:
        state, out = step(state, item["cloud"], item["imu"],
                          jnp.asarray(item["stamp"], jnp.float32))
    assert np.isfinite(np.asarray(out.t_map)).all()


@pytest.mark.slow
def test_cli_synthetic(tmp_path, monkeypatch):
    """End-to-end CLI run on a tiny synthetic sequence."""
    from rgc_slam_tpu import run as cli

    # shrink the synthetic source for test speed
    import rgc_slam_tpu.io.synthetic as syn

    orig = syn.generate_sequence

    def small(**kw):
        kw.update(n_azimuth=120)
        return orig(**kw)

    monkeypatch.setattr(syn, "generate_sequence", small)
    out = tmp_path / "out"
    cli.main(["--synthetic", "4", "--out-dir", str(out), "--no-loop",
              "--dump-frames", "--viz", "--viz-every", "2"])
    assert (out / "pose_evo.txt").exists()
    assert (out / "odometry_pose_evo.txt").exists()
    assert (out / "global_map.pcd").exists()
    assert (out / "metrics.jsonl").exists()
    timing = json.loads((out / "timing.json").read_text())
    assert timing["scan"]["count"] == 4
    # per-frame dumps (ref RGC_odometer.cpp:1353-1354) + viewer surface
    frames = sorted((out / "frames").glob("frame_*.pcd"))
    assert len(frames) == 4
    from rgc_slam_tpu.io.export import read_pcd

    xyz, _ = read_pcd(str(frames[0]))
    assert len(xyz) > 50 and np.isfinite(xyz).all()
    html = (out / "viewer.html").read_text()
    assert "<canvas" in html and "const DATA" in html


@pytest.mark.slow
def test_cli_ckpt_roundtrip(tmp_path, monkeypatch):
    """--save-ckpt output must be loadable by --localize (same tuple format
    as SlamSystem.save, with or without loop state in the checkpoint)."""
    from rgc_slam_tpu import run as cli
    import rgc_slam_tpu.io.synthetic as syn

    orig = syn.generate_sequence

    def small(**kw):
        kw.update(n_azimuth=120)
        return orig(**kw)

    monkeypatch.setattr(syn, "generate_sequence", small)
    ck = tmp_path / "ckpt"
    cli.main(["--synthetic", "4", "--out-dir", str(tmp_path / "a"),
              "--save-ckpt", str(ck)])  # loop enabled -> tuple w/ loop state
    cli.main(["--synthetic", "3", "--out-dir", str(tmp_path / "b"),
              "--localize", str(ck)])
    assert (tmp_path / "b" / "pose_evo.txt").exists()


@pytest.mark.slow
def test_cli_fleet_mode(tmp_path, monkeypatch):
    """--fleet B runs the vmapped fleet and dumps fleet metrics + poses."""
    from rgc_slam_tpu import run as cli
    import rgc_slam_tpu.io.synthetic as syn

    orig = syn.generate_sequence

    def small(**kw):
        kw.update(n_azimuth=120)
        return orig(**kw)

    monkeypatch.setattr(syn, "generate_sequence", small)
    out = tmp_path / "f"
    # chunk 2 over an odd scan count: covers the chunked fleet dispatch AND
    # the trailing-partial-chunk path
    cli.main(["--synthetic", "4", "--out-dir", str(out), "--no-loop",
              "--fleet", "3", "--chunk", "2"])
    poses = np.loadtxt(out / "fleet_final_poses.txt")
    assert poses.shape == (3, 3) and np.isfinite(poses).all()
    assert (out / "fleet_metrics.jsonl").exists()


@pytest.mark.slow
def test_cli_fleet_with_loops(tmp_path, monkeypatch):
    """Fleet SLAM keeps the pose-graph thread: loop closure is cadence-gated
    INSIDE the fused chunked program (fires at scan 10 here, r5), and an odd
    scan count over --chunk 2 also exercises the fused trailing-partial
    dispatch."""
    from rgc_slam_tpu import run as cli
    import rgc_slam_tpu.io.synthetic as syn

    orig = syn.generate_sequence

    def small(**kw):
        kw.update(n_azimuth=120)
        return orig(**kw)

    monkeypatch.setattr(syn, "generate_sequence", small)
    out = tmp_path / "fl"
    cli.main(["--synthetic", "13", "--out-dir", str(out), "--fleet", "2",
              "--chunk", "2"])
    poses = np.loadtxt(out / "fleet_final_poses.txt")
    assert poses.shape == (2, 3) and np.isfinite(poses).all()


def test_cli_fleet_rejects_unsupported_flags(tmp_path):
    """--fleet with per-frame dump / ckpt flags must fail loudly (ADVICE r2)."""
    from rgc_slam_tpu import run as cli

    with pytest.raises(SystemExit, match="--save-ckpt"):
        cli.main(["--synthetic", "3", "--out-dir", str(tmp_path / "x"),
                  "--fleet", "2", "--save-ckpt", str(tmp_path / "ck")])


@pytest.mark.slow
def test_chunked_system_matches_sequential(tmp_path):
    """SlamSystem(chunk=3) must produce the same trajectory as chunk=1 (the
    chunked program runs the identical per-scan computation; only dispatch
    granularity changes)."""
    import jax
    import jax.numpy as jnp
    from rgc_slam_tpu.config import TEST_CONFIG
    from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
    from rgc_slam_tpu.models.slam import SlamSystem

    seq = synthetic.generate_sequence(
        n_scans=9, n_azimuth=120, seed=9, extent=15.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    items = []
    for k in range(min(7, len(seq["scans"]))):
        cloud = cloud_from_scan_dict(seq["scans"][k], TEST_CONFIG)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, TEST_CONFIG.max_imu)
        items.append((cloud, imu, seq["stamps"][k]))

    seq_sys = SlamSystem(TEST_CONFIG, enable_loop=False)
    for cloud, imu, stamp in items:
        seq_sys.process(cloud, imu, stamp)

    chk_sys = SlamSystem(TEST_CONFIG, enable_loop=False, chunk=3)
    chk_sys.process_chunk(items[0:3])
    chk_sys.process_chunk(items[3:6])
    chk_sys.process(*items[6])

    t_seq = np.stack([t for _, _, t in seq_sys.trajectory])
    t_chk = np.stack([t for _, _, t in chk_sys.trajectory])
    assert t_seq.shape == t_chk.shape == (7, 3)
    np.testing.assert_allclose(t_chk, t_seq, atol=1e-5)
