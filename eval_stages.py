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


def fleet_breakdown(B: int = 128, iters: int = 20):
    """Per-stage device time at fleet batch, dispatch-amortized.

    Each stage runs `iters` times inside ONE jit via lax.scan, with an
    iteration-dependent carry perturbing the inputs (defeats loop-invariant
    hoisting/CSE), so per-iteration time = (wall - dispatch) / iters and the
    ~0.4 ms tunnel dispatch floor cancels out.
    """
    import jax.numpy as jnp
    from bench import FLEET_CONFIG, _stage_inputs
    from rgc_slam_tpu.parallel import fleet

    cfg = FLEET_CONFIG
    inputs, _ = _stage_inputs(cfg, B, 6)
    states = fleet.fleet_init(cfg, B)
    fstep = jax.jit(functools.partial(fleet.fleet_step, cfg=cfg))
    for k in range(4):
        states, _ = fstep(states, *inputs[k])
    jax.block_until_ready(states)
    cloud, imu, stamps = inputs[4]

    def scanned(body, init_carry):
        def outer(cloud, imu, stamps, st):
            def it(c, _):
                return body(c, cloud, imu, stamps, st), None
            c, _ = jax.lax.scan(it, init_carry, None, length=iters)
            return c
        return jax.jit(outer)

    def feat_body(c, cloud, imu, stamps, st):
        cl = cloud.replace(xyz=cloud.xyz + c * 1e-7)
        fx = jax.vmap(functools.partial(F.extract_features, cfg=cfg))(cl)
        return jnp.sum(fx.sharp.confidence) * 0.0 + c * 0.5

    def full_body(c, cloud, imu, stamps, st):
        cl = cloud.replace(xyz=cloud.xyz + c * 1e-7)
        _, out = fleet.fleet_step(st, cl, imu, stamps, cfg)
        return jnp.sum(out.fitness) * 0.0 + c * 0.5

    def odo_body(c, cloud, imu, stamps, st):
        cl = cloud.replace(xyz=cloud.xyz + c * 1e-7)
        fx = jax.vmap(functools.partial(F.extract_features, cfg=cfg))(cl)
        ost, oout = jax.vmap(functools.partial(odo_mod.odometry_step, cfg=cfg))(
            st.odo, fx, imu, stamps
        )
        return jnp.sum(oout.fitness) * 0.0 + c * 0.5

    rows = {}
    base = jnp.asarray(1.0, jnp.float32)
    for name, body in (("features", feat_body), ("feat+odo", odo_body),
                       ("full", full_body)):
        fn = scanned(body, base)
        ms = _time(lambda *a: fn(*a), (cloud, imu, stamps, states), n=8)
        rows[name] = ms / iters
        print(f"{name:10s} {ms / iters:8.3f} ms/step (B={B}, x{iters} scanned)",
              flush=True)
    print(f"{'odometry≈':10s} {rows['feat+odo'] - rows['features']:8.3f} ms/step")
    print(f"{'mapping≈':10s} {rows['full'] - rows['feat+odo']:8.3f} ms/step")
    return rows


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
    import sys

    if "--fleet" in sys.argv:
        fleet_breakdown()
    else:
        main()
