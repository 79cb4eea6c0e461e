"""Native sweep-log runtime (C++ reader/writer + prefetch)."""
import os

import numpy as np
import pytest

from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.runtime import loader


@pytest.fixture(scope="module")
def seq():
    return synthetic.generate_sequence(
        n_scans=6, n_azimuth=120, seed=4, extent=15.0, radius=6.0,
        closes_loop=False, speed=1.5,
    )


def test_build_and_roundtrip(tmp_path, seq):
    path = str(tmp_path / "seq.slog")
    loader.write_sequence(path, seq)
    with loader.SweepLogReader(path, pad_points=4096, pad_imu=64, prefetch=2) as r:
        assert r.n_scans == len(seq["scans"])
        scans = list(r)
    assert len(scans) == len(seq["scans"])
    for k, s in enumerate(scans):
        raw = seq["scans"][k]
        m = raw["mask"]
        n = int(m.sum())
        assert abs(s["stamp"] - seq["stamps"][k]) < 1e-9
        got = s["xyz"][s["mask"]]
        np.testing.assert_allclose(got[: min(n, 4096)], raw["xyz"][m][:4096], atol=1e-6)
        np.testing.assert_array_equal(
            s["ring"][s["mask"]][: min(n, 4096)], raw["ring"][m][:4096]
        )
        t_imu, acc, gyr = seq["imu"][k]
        ni = int(s["imu_mask"].sum())
        assert ni == min(len(t_imu), 64)
        np.testing.assert_allclose(s["imu_acc"][:ni], acc[:ni], atol=1e-6)


def test_reader_without_prefetch(tmp_path, seq):
    path = str(tmp_path / "seq2.slog")
    loader.write_sequence(path, seq)
    with loader.SweepLogReader(path, pad_points=2048, pad_imu=32, prefetch=0) as r:
        scans = list(r)
    assert len(scans) == len(seq["scans"])
    # truncation to pad capacity is clean
    assert all(s["xyz"].shape == (2048, 3) for s in scans)


@pytest.mark.slow
def test_feeds_pipeline(tmp_path, seq):
    """Sweep-log scans must convert into engine inputs and run a SLAM step."""
    import functools
    import jax
    import jax.numpy as jnp
    from rgc_slam_tpu.config import TEST_CONFIG as CFG
    from rgc_slam_tpu.io.convert import cloud_from_arrays, imu_from_interval
    from rgc_slam_tpu.models.slam import SlamState, slam_step

    path = str(tmp_path / "seq3.slog")
    loader.write_sequence(path, seq)
    state = SlamState.init(CFG)
    step = jax.jit(functools.partial(slam_step, cfg=CFG))
    with loader.SweepLogReader(path, CFG.max_points, CFG.max_imu) as r:
        for s in r:
            cloud = cloud_from_arrays(
                s["xyz"], s["intensity"], s["ring"], s["rel_time"], s["mask"],
                CFG.max_points,
            )
            imu = imu_from_interval(
                s["imu_t"][s["imu_mask"]], s["imu_acc"][s["imu_mask"]],
                s["imu_gyr"][s["imu_mask"]], CFG.max_imu,
            )
            state, out = step(state, cloud, imu, jnp.asarray(s["stamp"], jnp.float32))
    assert np.isfinite(np.asarray(out.t_map)).all()


def test_pcd_sink_async_roundtrip(tmp_path, rng):
    """Native async PCD sink: frames pushed through the bounded queue land on
    disk as valid PCDs with correct content, including queue backpressure."""
    from rgc_slam_tpu.io.export import read_pcd
    from rgc_slam_tpu.runtime.loader import PcdSink

    out = tmp_path / "frames"
    frames = [rng.uniform(-5, 5, (50 + 7 * i, 3)).astype(np.float32)
              for i in range(20)]
    with PcdSink(str(out), ring_slots=2) as sink:   # tiny ring: backpressure
        for i, f in enumerate(frames):
            sink.push(i, f)
    for i, f in enumerate(frames):
        xyz, _ = read_pcd(str(out / f"frame_{i:06d}.pcd"))
        np.testing.assert_allclose(xyz, f, rtol=1e-6)


def test_pcd_sink_empty_frame(tmp_path):
    from rgc_slam_tpu.io.export import read_pcd
    from rgc_slam_tpu.runtime.loader import PcdSink

    with PcdSink(str(tmp_path), ring_slots=2) as sink:
        sink.push(0, np.zeros((0, 3), np.float32))
    xyz, _ = read_pcd(str(tmp_path / "frame_000000.pcd"))
    assert len(xyz) == 0
