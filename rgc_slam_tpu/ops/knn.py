"""k-nearest-neighbor search for mapping association.

The reference uses FLANN kd-trees (``kdtreeCornerFromMap->nearestKSearch``,
RGC_mapping.cpp:1097,1203).  Trees are pointer-chasing structures hostile to
TPUs; instead the distance matrix is computed on the MXU via the
|a|^2 + |b|^2 - 2 a.b expansion and reduced with top_k — at mapping's scales
(≤2k queries × ≤32k map points) this is a handful of milliseconds of pure
matmul, and it vmaps across a fleet.  A Pallas fused-tile variant can replace
this without touching callers (same signature) if HBM traffic ever dominates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def knn(
    queries: jax.Array,       # [Q, 3]
    points: jax.Array,        # [N, 3]
    points_mask: jax.Array,   # [N]
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (sq_dists [Q, k], indices [Q, k]); masked points at +inf.

    On TPU with qualifying shapes this dispatches to the fused Pallas kernel
    (ops/pallas/knn_kernel.py) which keeps the distance block in VMEM; the XLA
    formulation below is the reference semantics and the fallback everywhere
    else.
    """
    if jax.default_backend() == "tpu":
        from .pallas.knn_kernel import knn_pallas, knn_supported

        if knn_supported(queries.shape[0], points.shape[0], k):
            return knn_pallas(queries, points, points_mask, k)
    # center to keep |a|^2 - 2ab cancellation well-conditioned in f32
    center = jnp.mean(queries, axis=0, keepdims=True)
    queries = queries - center
    points = points - center
    q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)          # [Q,1]
    p2 = jnp.sum(points * points, axis=-1)                           # [N]
    # full f32 precision: TPU matmuls default to bf16 inputs, whose ~8-bit
    # mantissa corrupts squared distances at map-scale coordinates
    cross = jnp.dot(
        queries, points.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                                 # [Q,N] MXU
    d2 = q2 + p2[None, :] - 2.0 * cross
    d2 = jnp.where(points_mask[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return jnp.maximum(-neg, 0.0), idx
