"""Masked point-cloud helpers (replacing PCL container plumbing)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math3d


def transform_points(q: jax.Array, t: jax.Array, pts: jax.Array) -> jax.Array:
    """Rigid transform of [N,3] points by pose (q, t)."""
    return math3d.quat_rotate(q[None, :], pts) + t[None, :]


def masked_centroid(pts: jax.Array, mask: jax.Array) -> jax.Array:
    w = mask.astype(pts.dtype)
    return jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)


def range_filter_mask(
    pts: jax.Array, mask: jax.Array, min_range: float, max_range: float
) -> jax.Array:
    """Range gate + rear-cone cut (ref ``removeClosedPointCloud``
    scanRegistration.cpp:732-763: drops x<0 && |y|<0.5 behind the robot)."""
    d2 = jnp.sum(pts * pts, axis=-1)
    keep = (d2 > min_range**2) & (d2 < max_range**2)
    rear = (pts[..., 0] < 0) & (jnp.abs(pts[..., 1]) < 0.5)
    return mask & keep & ~rear


def concat_padded(arrays, masks, out_cap: int):
    """Concatenate padded arrays along axis 0, re-padding to out_cap.

    Invalid entries are pushed to the end by a stable sort on ~mask; output is
    truncated/padded to out_cap.  (Static-shape substitute for `operator+=` on
    pcl::PointCloud.)
    """
    cat = jnp.concatenate(arrays, axis=0)
    m = jnp.concatenate(masks, axis=0)
    order = jnp.argsort(~m, stable=True)
    cat = cat[order][:out_cap]
    m = m[order][:out_cap]
    if cat.shape[0] < out_cap:
        pad = out_cap - cat.shape[0]
        cat = jnp.pad(cat, ((0, pad),) + ((0, 0),) * (cat.ndim - 1))
        m = jnp.pad(m, (0, pad))
    return cat, m
