"""Static-shape open-addressing voxel hash for TPU.

This is the TPU-native replacement for two components of the reference:
  * PCL ``VoxelGrid`` downsampling (RGC_odometer.cpp:976-991 and the mapping
    node's corner/surf filters), and
  * the GaussianVoxelMap underlying FastVGICP
    (``fast_vgicp_voxel.hpp:141-266`` CPU / ``cuda/gaussian_voxelmap.cu:21-57``
    GPU).  The GPU version claims buckets with ``atomicCAS``; XLA has no
    atomics, so claiming is re-expressed as a fixed number of *rounds* of
    ``scatter-min`` contention (each round, every still-unassigned point
    proposes its key for its probe slot; the minimum key wins; losers probe the
    next slot).  All shapes are static, so the whole structure jit/vmaps.

Keys pack quantized voxel coords into one non-negative int32 (10 bits/axis),
giving exact key comparison without int64 (disabled on TPU by default).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import VoxelMap

INT32_MAX = jnp.iinfo(jnp.int32).max
COORD_BITS = 10
COORD_OFFSET = 1 << (COORD_BITS - 1)       # 512
COORD_MASK = (1 << COORD_BITS) - 1
EMPTY = -1


def voxel_coords(
    pts: jax.Array, resolution: float | jax.Array, offset: float = 0.0
) -> jax.Array:
    """Points [..., 3] -> integer voxel coords.

    ``offset=0.0`` is the PCL ``VoxelGrid`` binning (floor(x/res)) used for
    downsampling; ``offset=0.5`` is the GaussianVoxelMap binning
    (floor(x/res - 0.5), fast_vgicp_voxel.hpp:160-162) used by every VGICP
    map build and lookup — the two conventions differ by half a voxel and the
    reference uses both, so parity requires both here.
    """
    return jnp.floor(pts / resolution - offset).astype(jnp.int32)


def pack_coords(coords: jax.Array, valid: jax.Array) -> jax.Array:
    """[..., 3] int coords -> single non-negative int32 key; invalid/out-of-range -> -1.

    CONTRACT: coords must lie within ±COORD_OFFSET (±512) voxels of the
    origin or the point is SILENTLY dropped (key = -1, excluded from every
    downstream table/lookup).  At 0.2 m resolution that is ±102 m; at 1.0 m,
    ±512 m.  Callers working in world coordinates MUST origin-shift first —
    see odometry._submap_target / mapping.assemble_local_map, which subtract
    floor(current position) so map-scale coordinates never approach the
    boundary.  The 80 m range gate keeps per-scan geometry comfortably inside;
    KITTI's ~120 m returns at 0.2 m are within budget only because of that
    shift.  (10 bits/axis keeps the packed key inside non-negative int32 —
    int64 is disabled on TPU by default.)
    """
    shifted = coords + COORD_OFFSET
    in_range = jnp.all((shifted >= 0) & (shifted <= COORD_MASK), axis=-1)
    key = (
        shifted[..., 0]
        | (shifted[..., 1] << COORD_BITS)
        | (shifted[..., 2] << (2 * COORD_BITS))
    )
    return jnp.where(valid & in_range, key, EMPTY)


def _hash_key(key: jax.Array, cap: int) -> jax.Array:
    """Multiplicative hash of packed key -> [0, cap).  cap must be power of 2."""
    h = (key * jnp.int32(-1640531527)) ^ (key >> 15)  # Knuth constant (2654435769 as i32)
    return jnp.abs(h) & (cap - 1)


def _hash_step(key: jax.Array, cap: int) -> jax.Array:
    """Second hash for double hashing: odd step (full cycle on power-of-2 cap)."""
    h = (key * jnp.int32(-2048144789)) ^ (key >> 13)
    return (jnp.abs(h) & (cap - 1)) | 1


class HashTable(NamedTuple):
    """Result of slot claiming: per-slot stored key and per-point slot index."""

    table_keys: jax.Array     # [CAP] int32, EMPTY where unused
    slot_of_point: jax.Array  # [N] int32, -1 for dropped/invalid points


def build_hash_table(keys: jax.Array, cap: int, probes: int = 16) -> HashTable:
    """Claim slots for (possibly duplicated) packed keys.

    Round-based contention instead of atomicCAS (see module docstring):
    every round each unassigned point proposes its key at probe slot
    ``(hash + p) & (cap-1)``; ``scatter-min`` picks one winner per slot; all
    points whose key matches the slot's stored key become assigned (this
    handles the common many-points-per-voxel case in one shot).
    """
    n = keys.shape[0]
    valid = keys >= 0
    h0 = _hash_key(keys, cap)
    step = _hash_step(keys, cap)
    table = jnp.full((cap,), EMPTY, jnp.int32)
    slot_of_point = jnp.full((n,), -1, jnp.int32)

    def round_fn(p, carry):
        table, slot_of_point = carry
        cand = (h0 + p * step) & (cap - 1)
        need = (slot_of_point < 0) & valid
        stored = table[cand]
        # propose into empty slots only
        attempt = need & (stored == EMPTY)
        proposals = jnp.where(attempt, keys, INT32_MAX)
        winner = jnp.full((cap,), INT32_MAX, jnp.int32).at[cand].min(proposals)
        table = jnp.where((table == EMPTY) & (winner < INT32_MAX), winner, table)
        # assignment: stored (or newly claimed) key matches ours
        match = table[cand] == keys
        slot_of_point = jnp.where(need & match, cand, slot_of_point)
        return table, slot_of_point

    table, slot_of_point = jax.lax.fori_loop(
        0, probes, round_fn, (table, slot_of_point)
    )
    return HashTable(table, slot_of_point)


def lookup_slots(table_keys: jax.Array, query_keys: jax.Array, probes: int = 16) -> jax.Array:
    """Probe-chain lookup: returns slot index or -1 if absent."""
    cap = table_keys.shape[0]
    h0 = _hash_key(query_keys, cap)
    step = _hash_step(query_keys, cap)
    slot = jnp.full(query_keys.shape, -1, jnp.int32)
    done = query_keys < 0
    for p in range(probes):
        cand = (h0 + p * step) & (cap - 1)
        stored = table_keys[cand]
        hit = (~done) & (stored == query_keys)
        slot = jnp.where(hit, cand, slot)
        done = done | hit | (stored == EMPTY)
    return slot


def voxel_downsample(
    pts: jax.Array,
    mask: jax.Array,
    resolution: float | jax.Array,
    cap: int,
    extras: Optional[Tuple[jax.Array, ...]] = None,
    probes: int = 16,
) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, ...]]:
    """Centroid voxel-grid downsample with static output shape [cap].

    Replaces ``pcl::VoxelGrid`` (RGC_odometer.cpp:976-991).  Returns
    (points [cap,3], mask [cap], extras averaged per voxel).  ``extras`` are
    per-point arrays with leading dim N to be voxel-averaged alongside.
    """
    coords = voxel_coords(pts, resolution)
    keys = pack_coords(coords, mask)
    ht = build_hash_table(keys, cap, probes)
    slot = jnp.where(ht.slot_of_point >= 0, ht.slot_of_point, cap)  # dropped -> scratch
    ones = jnp.where(slot < cap, 1.0, 0.0)
    counts = jax.ops.segment_sum(ones, slot, num_segments=cap + 1)[:cap]
    sums = jax.ops.segment_sum(
        pts * ones[:, None], slot, num_segments=cap + 1
    )[:cap]
    denom = jnp.maximum(counts, 1.0)
    out_pts = sums / denom[:, None]
    out_mask = counts > 0
    out_extras = []
    for e in extras or ():
        flat_w = ones.reshape((-1,) + (1,) * (e.ndim - 1))
        s = jax.ops.segment_sum(e * flat_w, slot, num_segments=cap + 1)[:cap]
        out_extras.append(s / denom.reshape((-1,) + (1,) * (e.ndim - 1)))
    return out_pts, out_mask, tuple(out_extras)


def build_gaussian_voxelmap(
    pts: jax.Array,
    covs: jax.Array,
    mask: jax.Array,
    resolution: float | jax.Array,
    cap: int,
    probes: int = 16,
) -> VoxelMap:
    """Build the VGICP target voxel map (ADDITIVE mode).

    Per-voxel mean = mean of member points; per-voxel cov = mean of member
    per-point covariances — matching ``GaussianVoxel::append`` ADDITIVE
    accumulation (fast_vgicp_voxel.hpp:141-266), with the half-voxel-shifted
    binning of ``GaussianVoxelMap::voxel_coord``.
    """
    coords = voxel_coords(pts, resolution, offset=0.5)
    keys = pack_coords(coords, mask)
    ht = build_hash_table(keys, cap, probes)
    slot = jnp.where(ht.slot_of_point >= 0, ht.slot_of_point, cap)
    w = jnp.where(slot < cap, 1.0, 0.0)
    counts = jax.ops.segment_sum(w, slot, num_segments=cap + 1)[:cap]
    mean = jax.ops.segment_sum(pts * w[:, None], slot, num_segments=cap + 1)[:cap]
    covsum = jax.ops.segment_sum(
        covs * w[:, None, None], slot, num_segments=cap + 1
    )[:cap]
    denom = jnp.maximum(counts, 1.0)
    return VoxelMap(
        keys=ht.table_keys,
        mean=mean / denom[:, None],
        cov=covsum / denom[:, None, None],
        num_points=counts,
        resolution=jnp.asarray(resolution, pts.dtype),
    )


def voxelmap_lookup(vm: VoxelMap, query_pts: jax.Array, probes: int = 16) -> jax.Array:
    """Query points -> voxel slot indices (-1 = no voxel).  DIRECT1 search
    (fast_vgicp_impl.hpp neighbor_offsets, DIRECT1 path); binning must match
    ``build_gaussian_voxelmap``'s half-shifted convention."""
    coords = voxel_coords(query_pts, vm.resolution, offset=0.5)
    keys = pack_coords(coords, jnp.ones(query_pts.shape[:-1], bool))
    return lookup_slots(vm.keys, keys, probes)
