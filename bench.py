"""Benchmark: registered scans/sec/chip on 16-channel data.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the C++ reference is a real-time 10 scans/sec CPU system (it warns
when a scan exceeds 100 ms, RGC_odometer.cpp:1360-1361 — see BASELINE.md);
vs_baseline is the speedup over that 10 Hz bar.  The measured step is the
full scan->pose pipeline (feature extraction -> odometry VGICP + fusion ->
scan-to-map optimization) on full-size 16-ch clouds.
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from rgc_slam_tpu.config import SlamConfig
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
from rgc_slam_tpu.models.slam import SlamState, slam_step

BENCH_CONFIG = SlamConfig(
    max_points=16384,          # 16 rings x 900 azimuth, masked
    max_source_points=8192,
    max_voxels=16384,
    max_keyframes=256,
    max_kf_corner=512,
    max_kf_surf=2048,
    max_map_points=16384,
    max_loop_submap_points=8192,
)

N_WARMUP = 5
N_TIMED = 40


def main():
    cfg = BENCH_CONFIG
    seq = synthetic.generate_sequence(
        n_scans=N_WARMUP + N_TIMED + 2, n_azimuth=900, seed=1,
        extent=30.0, radius=12.0, noise=0.01, closes_loop=False, speed=2.0,
    )
    step = jax.jit(functools.partial(slam_step, cfg=cfg))
    state = SlamState.init(cfg)

    # stage all inputs on device first — the bench measures the engine, not
    # host-side synthetic data generation
    inputs = []
    for k in range(len(seq["scans"])):
        cloud = cloud_from_scan_dict(seq["scans"][k], cfg)
        t_imu, acc, gyr = seq["imu"][k]
        imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
        inputs.append(
            jax.device_put((cloud, imu, jnp.asarray(seq["stamps"][k], jnp.float32)))
        )

    for k in range(N_WARMUP):
        state, out = step(state, *inputs[k])
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for k in range(N_WARMUP, N_WARMUP + N_TIMED):
        state, out = step(state, *inputs[k])
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    scans_per_sec = N_TIMED / elapsed
    print(
        json.dumps(
            {
                "metric": "registered scans/sec/chip (16-ch, full SLAM step)",
                "value": round(scans_per_sec, 2),
                "unit": "scans/sec",
                "vs_baseline": round(scans_per_sec / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
