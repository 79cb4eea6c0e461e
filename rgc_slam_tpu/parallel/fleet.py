"""Multi-robot fleet SLAM + multi-chip sharding.

The reference's parallelism is 3 pipelined processes + OpenMP point loops
(SURVEY §2.4); there is nothing to shard across machines for one robot.  The
TPU-native scaling story (BASELINE config 5) is therefore:

  * **vmap fleet** — one compiled program runs B independent SLAM instances
    per chip (multi-robot fleets / parameter sweeps).  All state is a batched
    pytree; the whole pipeline was built mask-padded so this is a one-liner.
  * **dp × sp mesh** — `shard_map` over a 2-D device Mesh: the fleet batch is
    sharded over the ``dp`` axis (zero cross-robot communication) and the
    VGICP hot loop is point-sharded over ``sp`` with psum-reduced 6x6 H / b /
    cost partials riding ICI (the scaling-book recipe: annotate shardings,
    let XLA insert the collectives; see cfg.psum_axis / ops/registration.py).
    A psum'd fleet-health summary over ``dp`` exercises the data-parallel
    collective as well.
"""
from __future__ import annotations

import dataclasses
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SlamConfig
from ..types import ImuBatch, PointCloud
from ..models.slam import SlamState, slam_step


def fleet_init(cfg: SlamConfig, n_robots: int) -> SlamState:
    """Batched initial state [B, ...] for a fleet of independent robots."""
    one = SlamState.init(cfg)
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (n_robots,) + a.shape), one)


def fleet_step(states: SlamState, clouds: PointCloud, imus: ImuBatch,
               stamps: jax.Array, cfg: SlamConfig):
    """vmapped slam_step over the robot axis (single chip)."""
    return jax.vmap(functools.partial(slam_step, cfg=cfg))(states, clouds, imus, stamps)


def compact_fleet(states: SlamState) -> SlamState:
    """Host-cadenced keyframe-store compaction for vmapped fleets.

    mapping_step's inline eviction is a lax.cond whose predicate is
    per-robot; under vmap XLA executes both branches, so every robot would
    pay the store-permutation gathers every scan.  Fleets therefore run
    with cfg.inline_compaction=False and call this every few scans (any
    cadence < mapping.COMPACT_MARGIN keeps the store from hitting the
    freeze backstop).  Each robot compacts only if its store is within
    COMPACT_MARGIN of capacity (where-select per leaf, so under-capacity
    robots keep their state bit-exact)."""
    from ..models.mapping import COMPACT_MARGIN, compact_keyframe_store

    def one(ms):
        need = ms.kf_count >= ms.kf_q.shape[0] - COMPACT_MARGIN
        ms2, _, _ = compact_keyframe_store(ms)
        return jax.tree.map(lambda a, b: jnp.where(need, a, b), ms2, ms)

    return states.replace(mapping=jax.vmap(one)(states.mapping))


@functools.partial(jax.jit, static_argnums=1)
def _near_capacity(kf_count: jax.Array, K: int) -> jax.Array:
    """Fleet-compaction predicate as a DEDICATED tiny output buffer.

    Fetching a leaf of the big step-output tuple drags the whole tuple
    through the device->host transfer path (seconds per fetch on
    remote-attached TPUs); routing the predicate through its own jitted
    program makes the fetched buffer one bool (~30 ms round-trip on the
    tunnel, microseconds on a local PCIe host)."""
    from ..models.mapping import COMPACT_MARGIN

    return jnp.any(kf_count >= K - COMPACT_MARGIN)


def compact_fleet_if_needed(states: SlamState, fcompact=None) -> SlamState:
    """Host-gated compaction (synchronous): evaluate the near-capacity
    predicate on device and dispatch ``compact_fleet`` only when some robot
    is actually within COMPACT_MARGIN of capacity.  The unconditional call
    moves the whole keyframe store (hundreds of MB at B=128) through a
    where-select every cadence; the gate costs one tiny device->host sync
    instead.  ``fcompact`` lets the caller pass a pre-jitted compact_fleet.
    Timed loops should prefer :class:`CompactGate`, which pipelines the
    fetch so even that round-trip is off the dispatch path."""
    K = states.mapping.kf_q.shape[-2]          # [..., K, 4]
    if bool(np.asarray(_near_capacity(states.mapping.kf_count, K))):
        return (fcompact or compact_fleet)(states)
    return states


class CompactGate:
    """Asynchronously host-gated fleet compaction.

    The synchronous gate pays one device->host round-trip per check —
    ~30 ms through a remote-attached TPU, which can triple the cost of a
    dispatch window whose useful work is a few ms.  This gate pipelines it:
    each ``check`` dispatches the tiny `_near_capacity` predicate, starts an
    async copy of the result, and acts on the value fetched by the PREVIOUS
    check, which has had a full stride of dispatch work to arrive — so the
    steady-state cost is enqueue overhead only.

    The decision is therefore one gate-stride stale.  Callers must size
    their check cadence so staleness + cadence still beat the keyframe
    freeze backstop: with checks every ``stride`` scans and chunked
    dispatch of C scans, the worst-case lag from a robot crossing the
    compaction threshold to the compaction dispatch is
    ``2*(stride + C - 1)`` scans, and at most one keyframe is added per
    scan, so ``stride <= COMPACT_MARGIN // 2 - C + 1`` keeps every robot
    under capacity (see models/mapping.COMPACT_MARGIN).

    ``prime`` performs one synchronous fetch outside any timed window: the
    first device->host transfer of a process can pay a large one-time
    transfer-path setup cost on tunneled devices.
    """

    def __init__(self, fcompact=None):
        self._fcompact = fcompact
        self._pending = None

    @staticmethod
    def stride(chunk: int = 1) -> int:
        from ..models.mapping import COMPACT_MARGIN

        return max(COMPACT_MARGIN // 2 - chunk + 1, 1)

    def prime(self, states: SlamState) -> None:
        K = states.mapping.kf_q.shape[-2]
        np.asarray(_near_capacity(states.mapping.kf_count, K))
        self._pending = None

    def check(self, states: SlamState) -> SlamState:
        if self._pending is not None and bool(np.asarray(self._pending)):
            states = (self._fcompact or compact_fleet)(states)
        K = states.mapping.kf_q.shape[-2]
        flag = _near_capacity(states.mapping.kf_count, K)
        try:
            flag.copy_to_host_async()
        except Exception:  # pragma: no cover - backends without async copy
            pass
        self._pending = flag
        return states


def fleet_loop_init(cfg: SlamConfig, n_robots: int):
    """Batched LoopState [B, ...] for fleet loop closure."""
    from ..models.loop import LoopState

    one = LoopState.init(cfg)
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (n_robots,) + a.shape), one)


def fleet_loop_step(states: SlamState, loop_states, cfg: SlamConfig):
    """vmapped loop_closure_step — fleet SLAM includes the pose-graph thread
    (the reference always runs it when enabled, RGC_mapping.cpp:303-304,1962;
    VERDICT r2 item 2).  Host-cadenced like SlamSystem (every
    cfg.loop_cadence scans); the PGO lax.cond executes both branches under
    vmap, which the cadence amortizes.  Also performs the loop-aware
    keyframe-store compaction, so fleets running loops must NOT mix in
    ``compact_fleet`` (it would relabel keyframes under the loop store)."""
    from ..models.loop import loop_closure_step

    return jax.vmap(functools.partial(loop_closure_step, cfg=cfg))(
        states, loop_states
    )


def fleet_loop_compact(states: SlamState, loop_states, cfg: SlamConfig):
    """vmapped loop-AWARE compaction only (no detection/PGO) — the eviction
    backstop between loop-closure dispatches when the chunked cadence could
    otherwise exceed the keyframe headroom (see run.py --fleet)."""
    from ..models.loop import _maybe_compact

    def one(s, ls):
        return _maybe_compact(s, ls, cfg)

    new_states, new_ls = jax.vmap(one)(states, loop_states)
    return new_states, new_ls


def make_mesh(n_dp: int, n_sp: int) -> Mesh:
    devs = np.asarray(jax.devices()[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(devs, axis_names=("dp", "sp"))


def make_distributed_step(mesh: Mesh, cfg: SlamConfig):
    """shard_map'd fleet step over a ('dp','sp') mesh.

    The robot batch is sharded over dp; each robot's registration reduction is
    point-sharded over sp (psum on H/b/cost inside lm_register).  State and
    inputs are replicated over sp and sharded over dp.  Returns a function
    (states, clouds, imus, stamps) -> (states, outputs, fleet_mean_fitness).
    """
    n_sp = int(mesh.shape["sp"])
    # block-slice sharding needs the point capacities divisible by sp;
    # otherwise fall back to stride-masked sharding (correct, less speedup)
    divisible = all(
        c % n_sp == 0
        for c in (cfg.max_source_points, cfg.max_kf_corner, cfg.max_kf_surf)
    )
    sp_cfg = dataclasses.replace(
        cfg, psum_axis="sp", sp_shards=n_sp if divisible else 1
    )

    def local_step(states, clouds, imus, stamps):
        new_states, outs = jax.vmap(functools.partial(slam_step, cfg=sp_cfg))(
            states, clouds, imus, stamps
        )
        # fleet-health summary: mean fitness over ALL robots (dp collective)
        local_sum = jnp.sum(outs.fitness)
        local_n = jnp.asarray(outs.fitness.shape[0], jnp.float32)
        total = jax.lax.psum(local_sum, "dp")
        count = jax.lax.psum(local_n, "dp")
        return new_states, outs, total / count

    # robots sharded over dp, replicated over sp
    batch_spec = P("dp")
    return jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(batch_spec, batch_spec, batch_spec, batch_spec),
            out_specs=(batch_spec, batch_spec, P()),
            check_vma=False,
        )
    )
