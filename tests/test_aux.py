"""Auxiliary subsystems: GNSS, checkpoint/resume, exports, profiling,
localization mode."""
import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
from rgc_slam_tpu.io.export import (
    compose_map_pose, global_map, loop_edges, read_pcd, write_pcd,
)
from rgc_slam_tpu.io.gnss import GnssFix, GnssTrack, gnss_to_xyz
from rgc_slam_tpu.models import loop as loop_mod
from rgc_slam_tpu.models.slam import SlamState, slam_step
from rgc_slam_tpu.utils import checkpoint as ckpt
from rgc_slam_tpu.utils import math3d as m3
from rgc_slam_tpu.utils.profiling import Metrics, StageTimer, TicToc

CFG = TEST_CONFIG


def test_gnss_to_xyz_scale():
    anchor = GnssFix(t=0, latitude=45.0, longitude=10.0, altitude=100.0)
    # 1e-5 deg latitude ~= 1.11 m north
    fix = GnssFix(t=1, latitude=45.00001, longitude=10.0, altitude=101.0)
    p = gnss_to_xyz(fix, anchor)
    assert abs(p[1] - 1.112) < 0.01
    assert abs(p[0]) < 1e-6
    assert abs(p[2] - 1.0) < 1e-9
    # longitude arc shrinks with cos(lat)
    fix2 = GnssFix(t=2, latitude=45.0, longitude=10.00001, altitude=100.0)
    p2 = gnss_to_xyz(fix2, anchor)
    assert abs(p2[0] - 1.112 * np.cos(np.radians(45.0))) < 0.01


def test_gnss_track(tmp_path):
    track = GnssTrack()
    for i in range(5):
        track.push(GnssFix(t=i * 0.1, latitude=45 + i * 1e-5, longitude=10.0, altitude=0))
    stamps, xyz = track.as_arrays()
    assert xyz.shape == (5, 3)
    assert xyz[0, 1] == 0.0 and xyz[-1, 1] > 4.0
    track.dump_tum(str(tmp_path / "rtk.txt"))
    assert (tmp_path / "rtk.txt").read_text().count("\n") == 5


@pytest.fixture(scope="module")
def short_run():
    seq = synthetic.generate_sequence(
        n_scans=8, n_azimuth=240, seed=2, extent=15.0, radius=6.0,
        noise=0.004, closes_loop=False, speed=1.5,
    )
    state = SlamState.init(CFG)
    step = jax.jit(functools.partial(slam_step, cfg=CFG))
    for k in range(len(seq["scans"])):
        cloud = cloud_from_scan_dict(seq["scans"][k], CFG)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
        state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32))
    return seq, state, step


def test_checkpoint_roundtrip(tmp_path, short_run):
    seq, state, step = short_run
    ckpt.save(str(tmp_path / "ck"), state, step=7)
    restored, step_no = ckpt.restore(str(tmp_path / "ck"), SlamState.init(CFG))
    assert step_no == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_resume_continues_identically(tmp_path, short_run):
    """Processing scans 0..3, checkpointing, resuming, processing 4..7 must
    equal an uninterrupted run."""
    seq, final_state, step = short_run

    def run(state, lo, hi):
        for k in range(lo, hi):
            cloud = cloud_from_scan_dict(seq["scans"][k], CFG)
            t_imu, acc, gyr = seq["imu"][k]
            imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
            state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32))
        return state

    half = run(SlamState.init(CFG), 0, 4)
    ckpt.save(str(tmp_path / "mid"), half, step=4)
    resumed, _ = ckpt.restore(str(tmp_path / "mid"), SlamState.init(CFG))
    full = run(resumed, 4, len(seq["scans"]))
    np.testing.assert_allclose(
        np.asarray(full.mapping.t_w_last), np.asarray(final_state.mapping.t_w_last),
        atol=1e-5,
    )


@pytest.mark.slow
def test_localization_mode_freezes_map(short_run):
    """map_update=False: keyframe store must not grow, loops must not fire."""
    seq, mapped_state, _ = short_run
    loc_cfg = dataclasses.replace(CFG, map_update=False)
    step = jax.jit(functools.partial(slam_step, cfg=loc_cfg))
    # start localization from the previously built map
    state = SlamState.init(loc_cfg).replace(mapping=mapped_state.mapping)
    kf0 = int(state.mapping.kf_count)
    for k in range(3):
        cloud = cloud_from_scan_dict(seq["scans"][k], loc_cfg)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, loc_cfg.max_imu)
        state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32))
        assert not bool(out.kf_added)
    assert int(state.mapping.kf_count) == kf0


def test_global_map_and_pcd(tmp_path, short_run):
    seq, state, _ = short_run
    pts, conf = global_map(state.mapping, CFG)
    assert pts.shape[0] > 100
    assert np.isfinite(pts).all()
    p = str(tmp_path / "map.pcd")
    write_pcd(p, pts, conf)
    xyz2, inten2 = read_pcd(p)
    np.testing.assert_allclose(xyz2, pts, atol=1e-6)
    np.testing.assert_allclose(inten2, conf, atol=1e-6)


def test_loop_edges_empty(short_run):
    seq, state, _ = short_run
    ls = loop_mod.LoopState.init(CFG)
    edges = loop_edges(state.mapping, ls)
    assert edges.shape == (0, 2, 3)


def test_compose_map_pose():
    q_md = m3.ypr_to_quat(jnp.array([0.3, 0.0, 0.0]))
    t_md = jnp.array([1.0, 2.0, 0.0])
    q_o = m3.quat_identity()
    t_o = jnp.array([1.0, 0.0, 0.0])
    q, t = compose_map_pose(q_md, t_md, q_o, t_o)
    expected = np.asarray(t_md) + np.asarray(m3.quat_rotate(q_md, t_o))
    np.testing.assert_allclose(np.asarray(t), expected, atol=1e-6)


def test_profiling_tools():
    timer = StageTimer(budget_ms=1e9)
    tt = TicToc()
    with timer.stage("work"):
        _ = jnp.sum(jnp.ones((64, 64))).block_until_ready()
    assert tt.toc() >= 0.0
    s = timer.summary()
    assert "work" in s and s["work"]["count"] == 1
    m = Metrics()
    m.log(0, fitness=0.12, n_corr=500)
    m.log(1, fitness=0.10)
    assert m.series("fitness").shape == (2,)


@pytest.mark.slow
def test_init_pose_config():
    """init_x/y/z/yaw must set the first-frame pose (run.launch:33-36)."""
    cfg = dataclasses.replace(CFG, init_x=2.0, init_y=-1.0, init_z=0.5,
                              init_yaw=0.5, use_imu=False)
    seq = synthetic.generate_sequence(
        n_scans=3, n_azimuth=120, seed=6, extent=15.0, radius=6.0,
        closes_loop=False, speed=1.5,
    )
    state = SlamState.init(cfg)
    step = jax.jit(functools.partial(slam_step, cfg=cfg))
    cloud = cloud_from_scan_dict(seq["scans"][0], cfg)
    t_imu, acc, gyr = seq["imu"][0]
    imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
    state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][0], jnp.float32))
    np.testing.assert_allclose(np.asarray(out.t_odom), [2.0, -1.0, 0.5], atol=1e-5)
    np.testing.assert_allclose(
        float(m3.quat_to_ypr(out.q_odom)[0]), 0.5, atol=1e-5
    )


@pytest.mark.slow
def test_mapping_skip_frame():
    """mapping_skip_frame=2: keyframes only added on mapped frames; outputs
    still composed from map->odom on skipped frames."""
    cfg = dataclasses.replace(CFG, mapping_skip_frame=2)
    seq = synthetic.generate_sequence(
        n_scans=7, n_azimuth=240, seed=8, extent=15.0, radius=6.0,
        closes_loop=False, speed=2.0,
    )
    state = SlamState.init(cfg)
    step = jax.jit(functools.partial(slam_step, cfg=cfg))
    counts = []
    for k in range(len(seq["scans"])):
        cloud = cloud_from_scan_dict(seq["scans"][k], cfg)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
        state, out = step(state, cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32))
        counts.append(int(state.mapping.count))
        assert np.isfinite(np.asarray(out.t_map)).all()
    # mapping ran on every other frame
    assert counts[-1] <= (len(counts) + 1) // 2 + 1


def test_keyframe_pcd_dump(tmp_path, short_run):
    from rgc_slam_tpu.io.export import write_keyframe_pcds

    seq, state, _ = short_run
    write_keyframe_pcds(state.mapping, str(tmp_path / "kf"))
    import os
    files = os.listdir(tmp_path / "kf")
    n_kf = int(state.mapping.kf_count)
    assert len(files) == 2 * n_kf


@pytest.mark.slow
def test_slam_system_with_loops():
    """SlamSystem host driver runs the loop cadence without error."""
    from rgc_slam_tpu.models.slam import SlamSystem

    seq = synthetic.generate_sequence(
        n_scans=12, n_azimuth=120, seed=9, extent=15.0, radius=6.0,
        closes_loop=False, speed=1.5,
    )
    system = SlamSystem(CFG)
    for k in range(len(seq["scans"])):
        cloud = cloud_from_scan_dict(seq["scans"][k], CFG)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, CFG.max_imu)
        system.process(cloud, imu, seq["stamps"][k])
    assert len(system.trajectory) == len(seq["scans"])


def test_expected_ground_ranges_per_sensor():
    """ADVICE fix: 32-beam uses its own elevation table; 64-beam + ground
    raises (its ring 0 is the highest beam, the low-ring heuristic breaks)."""
    import dataclasses
    import math
    import pytest as _pytest
    from rgc_slam_tpu.config import SlamConfig

    c16 = SlamConfig()
    c32 = dataclasses.replace(c16, n_scans=32)
    r16 = c16.expected_ground_ranges
    r32 = c32.expected_ground_ranges
    assert r16 != r32
    # ring 0: 16-beam at -15 deg, 32-beam at -92/3 deg
    assert abs(r16[0] - 0.56 / math.sin(math.radians(15.0))) < 1e-6
    assert abs(r32[0] - 0.56 / math.sin(math.radians(92.0 / 3.0))) < 1e-6
    c64_bad = dataclasses.replace(c16, n_scans=64, use_ground=True)
    with _pytest.raises(ValueError):
        _ = c64_bad.expected_ground_ranges
    # ground off -> no raise (KITTI config path)
    c64 = dataclasses.replace(c16, n_scans=64, use_ground=False)
    assert len(c64.expected_ground_ranges) == c64.ground_scan_rings + 1


def test_corridor_world_clutter_options():
    """corridor_world grows staggered alcoves/pillars that rays actually hit
    (the eval config-3 observability clutter)."""
    from rgc_slam_tpu.io import synthetic

    blank = synthetic.corridor_world(length=70.0, width=8.0)
    w = synthetic.corridor_world(length=70.0, width=8.0,
                                 alcove_spacing=24.0, pillar_spacing=24.0)
    assert w.boxes.shape[0] > blank.boxes.shape[0] == 4
    assert w.cylinders.shape[0] >= 2 and blank.cylinders.shape[0] == 0
    # alcoves stagger between the two walls
    ys = w.boxes[4:, 1] + w.boxes[4:, 4]
    assert (ys > 0).any() and (ys < 0).any()
    sc = synthetic.cast_scan(w, np.eye(3), np.array([-12.0, 0.0, 0.56]),
                             n_rings=16, n_azimuth=360,
                             rng=np.random.default_rng(0), noise=0.0)
    sb = synthetic.cast_scan(blank, np.eye(3), np.array([-12.0, 0.0, 0.56]),
                             n_rings=16, n_azimuth=360,
                             rng=np.random.default_rng(0), noise=0.0)
    # clutter occludes wall points -> the cluttered scan differs from blank
    assert not np.allclose(sc["xyz"], sb["xyz"])


def test_sp_shards_divisibility_validated():
    """Block-slice sp sharding would silently drop tail points if a point
    capacity is not divisible by sp_shards — constructing such a config must
    raise (fleet.make_distributed_step falls back to stride masking instead)."""
    import dataclasses
    import pytest as _pytest
    from rgc_slam_tpu.config import SlamConfig

    base = SlamConfig()
    ok = dataclasses.replace(base, sp_shards=2)        # all caps even
    assert ok.sp_shards == 2
    with _pytest.raises(ValueError, match="sp_shards"):
        dataclasses.replace(base, sp_shards=3, max_source_points=4096)


def test_viz_html(tmp_path):
    """render_html embeds the geometry and is self-contained (no externals)."""
    from rgc_slam_tpu.io.viz import render_html

    traj = np.cumsum(np.random.default_rng(0).normal(size=(30, 3)), axis=0)
    pts = np.random.default_rng(1).normal(size=(500, 3)) * 10
    edges = np.stack([traj[:2], traj[-2:]], axis=1)
    html = render_html(traj, pts, edges, n_kf=7, refresh_s=2.0)
    assert "<canvas" in html and "http-equiv=\"refresh\"" in html
    import json as _json
    payload = html.split("const DATA = ", 1)[1].split(";\n", 1)[0]
    data = _json.loads(payload)
    assert len(data["traj"]) == 30 and len(data["map"]) == 500
    assert len(data["loops"]) == 2 and data["n_kf"] == 7
    assert "http://" not in html and "https://" not in html  # no CDN deps
    p = tmp_path / "viewer.html"
    p.write_text(render_html(traj, pts))
    assert p.stat().st_size > 1000


def test_viz_write_viewer(tmp_path, short_run):
    from rgc_slam_tpu.io.viz import write_viewer
    from rgc_slam_tpu.models.slam import SlamSystem

    seq, state, step = short_run
    sys_ = SlamSystem(CFG, enable_loop=True)
    sys_.state = state
    sys_.trajectory = [(0.0, np.array([1, 0, 0, 0.0]), np.zeros(3))]
    write_viewer(str(tmp_path / "v.html"), sys_, CFG)
    assert (tmp_path / "v.html").exists()
