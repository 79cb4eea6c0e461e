"""Pallas TPU kernel: fused k-nearest-neighbor search.

The XLA path (ops/knn.py) computes the [Q, N] squared-distance matrix with an
MXU matmul and reduces it with top_k; at fleet scale that intermediate is the
pipeline's largest tensor (e.g. 2048x16384 f32 = 128 MB per robot per
association pass).  This kernel tiles the queries over a grid and keeps each
[TQ, N] distance block entirely in VMEM: one MXU dot per tile, then k
min-extraction sweeps on the VPU — the distance matrix never touches HBM.

Numerics match ops/knn.py exactly (centered f32 |a|^2+|b|^2-2ab with masked
points at +inf), so the two paths are interchangeable; `ops/knn.knn` picks the
kernel on TPU when shapes qualify.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 64                       # query tile (sublane-friendly)
LANE = 128


def _knn_kernel(q_ref, p_ref, p2_ref, out_d_ref, out_i_ref, *, k: int, n: int):
    q = q_ref[:]                                       # [TQ, 4] padded xyz
    p = p_ref[:]                                       # [N, 4]
    p2 = p2_ref[:]                                     # [1, N] (inf at masked)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)         # [TQ, 1]
    cross = jax.lax.dot_general(
        q, p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [TQ, N]
    d2 = q2 + p2 - 2.0 * cross                         # masked cols -> +inf
    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, n), 1)

    def extract(j, carry):
        d2c = carry
        m = jnp.min(d2c, axis=1)                       # [TQ]
        # leftmost argmin via masked column-index min
        is_min = d2c <= m[:, None]
        am = jnp.min(jnp.where(is_min, col, n), axis=1)
        out_d_ref[:, j] = jnp.maximum(m, 0.0)
        out_i_ref[:, j] = am
        d2c = jnp.where(col == am[:, None], jnp.inf, d2c)
        return d2c

    jax.lax.fori_loop(0, k, extract, d2, unroll=True)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(queries, points, points_mask, k: int, interpret: bool = False):
    """Drop-in equivalent of ops/knn.knn (same outputs)."""
    qn, n = queries.shape[0], points.shape[0]
    # center for f32 conditioning (same as the XLA path)
    center = jnp.mean(queries, axis=0, keepdims=True)
    queries = queries - center
    points = points - center

    # pad: queries to TQ multiple, points assumed LANE-multiple (static caps
    # in this engine are powers of two >= 128)
    qpad = (-qn) % TQ
    q4 = jnp.pad(queries, ((0, qpad), (0, 1)))          # xyz -> xyz0
    p4 = jnp.pad(points, ((0, 0), (0, 1)))
    p2 = jnp.where(points_mask, jnp.sum(points * points, axis=1), jnp.inf)[None, :]

    grid = ((qn + qpad) // TQ,)
    out_shape = (
        jax.ShapeDtypeStruct(((qn + qpad), k), jnp.float32),
        jax.ShapeDtypeStruct(((qn + qpad), k), jnp.int32),
    )
    d, i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 4), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TQ, k), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, k), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(q4, p4, p2)
    return d[:qn], i[:qn]


def knn_supported(qn: int, n: int, k: int) -> bool:
    """Shapes where the kernel both works and wins: lane-aligned point count,
    VMEM-fitting distance block, and a large enough problem that saved HBM
    traffic beats the extra launch (measured crossover ~4M distance pairs).

    The VMEM budget must count the kernel's real live set, not just the d2
    block: the column-index iota is a second [TQ, n] i32, and the unrolled
    min-extraction keeps a masked d2 copy live — ~3x TQ*n*4 total.  Under
    vmap (the fleet) Mosaic also double-buffers operand/output blocks across
    the batch grid dimension.  Budgeting only the d2 block OOMed scoped VMEM
    (32 MB vs the 16 MB limit) at n=32768 inside a vmapped fleet step; an
    8 MB cap on the live-set estimate leaves margin for the double
    buffering.  Oversize shapes fall back to the XLA top_k path, which is
    correct everywhere."""
    if n % LANE != 0:
        return False
    if qn * n < 4 * 1024 * 1024:
        return False
    vmem_bytes = 3 * TQ * n * 4 + n * 16 + n * 4
    return vmem_bytes < 8 * 1024 * 1024 and k <= 16
