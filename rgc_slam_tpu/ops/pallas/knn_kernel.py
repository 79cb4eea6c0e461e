"""Pallas TPU kernel: fused k-nearest-neighbor search, streaming point tiles.

The XLA path (ops/knn.py) computes the [Q, N] squared-distance matrix with an
MXU matmul and reduces it with top_k; at mapping-association scale that
intermediate is the pipeline's largest tensor (2048x32768 f32 = 256 MB of HBM
write+read per call, twice per mapping step).  This kernel tiles BOTH axes:
queries over the outer grid, points over an inner sequential grid with a
running top-k kept in VMEM scratch — the distance matrix never exists in
HBM at any size, and per-tile VMEM stays ~3 MB regardless of N.

Per (q-tile, p-tile) step: one MXU dot -> [TQ, TN] block, k min-extraction
sweeps on the VPU (leftmost-min for XLA top_k tie parity), then a k-sweep
merge of the 2k concatenated (running ++ candidate) columns.  Cross-lane
index selection is done with masked reductions (sum over ccol==pos), never
dynamic gathers — the one Mosaic lowering this formulation must avoid.

Numerics match ops/knn.py exactly (centered f32 |a|^2+|b|^2-2ab with masked
points at +inf, ties to the lower index), so the two paths are
interchangeable; `ops/knn.knn` picks the kernel on TPU when shapes qualify.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 64                       # query tile (sublane-friendly)
TN = 4096                     # point tile (lanes); bounds VMEM at any N
LANE = 128


def _knn_kernel(q_ref, p_ref, p2_ref, out_d_ref, out_i_ref,
                run_d_ref, run_i_ref, *, k: int, tn: int, n_tiles: int,
                n_pad: int):
    j = pl.program_id(1)                               # point tile (inner)
    q = q_ref[:]                                       # [TQ, 4] padded xyz
    p = p_ref[:]                                       # [TN, 4]
    p2 = p2_ref[:]                                     # [1, TN] (inf masked)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)         # [TQ, 1]
    cross = jax.lax.dot_general(
        q, p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [TQ, TN]
    d2 = q2 + p2 - 2.0 * cross                         # masked cols -> +inf
    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, tn), 1) + j * tn

    # ---- in-tile top-k: k leftmost-min sweeps (ascending candidates) ----
    cand_d, cand_i = [], []
    d2c = d2
    for _ in range(k):
        m = jnp.min(d2c, axis=1)                       # [TQ]
        is_min = d2c <= m[:, None]
        am = jnp.min(jnp.where(is_min, col, n_pad), axis=1)
        cand_d.append(m)
        cand_i.append(am)
        d2c = jnp.where(col == am[:, None], jnp.inf, d2c)
    cand_d = jnp.stack(cand_d, axis=1)                 # [TQ, k] ascending
    cand_i = jnp.stack(cand_i, axis=1)

    # ---- merge with the running top-k (VMEM scratch) ----
    run_d = jnp.where(j == 0, jnp.inf, run_d_ref[:])
    run_i = jnp.where(j == 0, n_pad, run_i_ref[:])
    # concat order [running, candidates]: on value ties the leftmost column
    # wins, i.e. the earlier tile's (smaller) index — XLA top_k tie parity
    comb_d = jnp.concatenate([run_d, cand_d], axis=1)  # [TQ, 2k]
    comb_i = jnp.concatenate([run_i, cand_i], axis=1)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (TQ, 2 * k), 1)
    new_d, new_i = [], []
    for _ in range(k):
        m = jnp.min(comb_d, axis=1)
        pos = jnp.min(jnp.where(comb_d <= m[:, None], ccol, 2 * k), axis=1)
        sel = ccol == pos[:, None]
        # masked reduction instead of a cross-lane gather
        idx = jnp.sum(jnp.where(sel, comb_i, 0), axis=1)
        new_d.append(m)
        new_i.append(idx)
        comb_d = jnp.where(sel, jnp.inf, comb_d)
    run_d = jnp.stack(new_d, axis=1)
    run_i = jnp.stack(new_i, axis=1)
    run_d_ref[:] = run_d
    run_i_ref[:] = run_i

    out_d_ref[:] = jnp.maximum(run_d, 0.0)
    out_i_ref[:] = run_i


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(queries, points, points_mask, k: int, interpret: bool = False):
    """Drop-in equivalent of ops/knn.knn (same outputs)."""
    qn, n = queries.shape[0], points.shape[0]
    # center for f32 conditioning (same as the XLA path)
    center = jnp.mean(queries, axis=0, keepdims=True)
    queries = queries - center
    points = points - center

    tn = min(TN, max(LANE, n))
    qpad = (-qn) % TQ
    npad = (-n) % tn
    q4 = jnp.pad(queries, ((0, qpad), (0, 1)))          # xyz -> xyz0
    p4 = jnp.pad(points, ((0, npad), (0, 1)))
    p2 = jnp.where(points_mask, jnp.sum(points * points, axis=1), jnp.inf)
    p2 = jnp.pad(p2, (0, npad), constant_values=jnp.inf)[None, :]

    n_pad = n + npad
    n_tiles = n_pad // tn
    grid = ((qn + qpad) // TQ, n_tiles)
    out_shape = (
        jax.ShapeDtypeStruct(((qn + qpad), k), jnp.float32),
        jax.ShapeDtypeStruct(((qn + qpad), k), jnp.int32),
    )
    d, i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tn=tn, n_tiles=n_tiles, n_pad=n_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 4), lambda g, j: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 4), lambda g, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda g, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TQ, k), lambda g, j: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, k), lambda g, j: (g, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TQ, k), jnp.float32),
            pltpu.VMEM((TQ, k), jnp.int32),
        ],
        interpret=interpret,
    )(q4, p4, p2)
    # unfilled slots carry the (inf, n_pad) scratch seed; clamp indices into
    # [0, n) so consumers gating on mask[idx] read a real (if masked) column,
    # matching the XLA path's always-in-range indices (ADVICE r2)
    return d[:qn], jnp.minimum(i[:qn], n - 1)


def knn_supported(qn: int, n: int, k: int) -> bool:
    """Shapes where the kernel both works and wins: lane-aligned point count,
    a large enough problem that saved HBM traffic beats the extra launch
    (measured crossover ~4M distance pairs), and small k (the in-kernel
    sweeps are O(k) VPU passes over the tile).  VMEM is bounded by the
    [TQ, TN] tile regardless of N — the point axis streams through an inner
    sequential grid with a running top-k in scratch, so there is no upper
    size limit (the previous single-block design OOMed scoped VMEM at
    n=32768 inside a vmapped fleet step)."""
    if n % LANE != 0:
        return False
    if qn * n < 4 * 1024 * 1024:
        return False
    # k=20 covers the gicp/normal-estimation paths (fast_gicp's
    # k_correspondences default) — keeps their self-kNN off the XLA path's
    # full [N, N] distance matrix (1 GB at the 16k loop-submap cap)
    return k <= 24
