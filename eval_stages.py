"""Per-stage timing + FLOPs breakdown of one SLAM step on the bench config.

Times each pipeline stage (features / odometry / mapping / full step) as a
separately jitted function on real hardware and reports XLA cost-analysis
FLOPs + bytes, to aim kernel work at the true hot spot (VERDICT r1 item 4).

Run: `python eval_stages.py` (TPU) or `JAX_PLATFORMS=cpu ...` (debug).
"""
from __future__ import annotations

import functools
import statistics
import time

import jax
import jax.numpy as jnp

from bench import BENCH_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict, imu_from_interval
from rgc_slam_tpu.models import odometry as odo_mod
from rgc_slam_tpu.models.slam import SlamState, slam_step
from rgc_slam_tpu.ops import features as F


def _time(fn, args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def _cost(fn, args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
    except Exception:
        return None, None


def main():
    cfg = BENCH_CONFIG
    seq = synthetic.generate_sequence(
        n_scans=8, n_azimuth=900, seed=1, extent=30.0, radius=12.0,
        noise=0.01, closes_loop=False, speed=2.0,
    )
    cloud = cloud_from_scan_dict(seq["scans"][3], cfg)
    t_imu, acc, gyr = seq["imu"][3]
    imu = imu_from_interval(t_imu, acc, gyr, cfg.max_imu)
    stamp = jnp.asarray(seq["stamps"][3], jnp.float32)

    # warm a state by running a few real steps
    state = SlamState.init(cfg)
    step = jax.jit(functools.partial(slam_step, cfg=cfg))
    for k in range(3):
        c = cloud_from_scan_dict(seq["scans"][k], cfg)
        ti, a, g = seq["imu"][k]
        state, _ = step(state, c, imu_from_interval(ti, a, g, cfg.max_imu),
                        jnp.asarray(seq["stamps"][k], jnp.float32))
    jax.block_until_ready(state)

    feats = jax.jit(functools.partial(F.extract_features, cfg=cfg))
    fx = feats(cloud)

    odostep = jax.jit(functools.partial(odo_mod.odometry_step, cfg=cfg))

    rows = []
    for name, fn, args in (
        ("features", feats, (cloud,)),
        ("odometry", odostep, (state.odo, fx, imu, stamp)),
        ("full_step", step, (state, cloud, imu, stamp)),
    ):
        ms = _time(fn, args)
        flops, byt = _cost(lambda *a: fn(*a), args)
        rows.append((name, ms, flops, byt))
        print(f"{name:10s} {ms:8.3f} ms   flops={flops and flops/1e9:.3f} G  "
              f"bytes={byt and byt/1e6:.1f} MB", flush=True)
    mapping_ms = rows[2][1] - rows[1][1] - rows[0][1]
    print(f"{'mapping≈':10s} {mapping_ms:8.3f} ms (full - odo - features)")


if __name__ == "__main__":
    main()
