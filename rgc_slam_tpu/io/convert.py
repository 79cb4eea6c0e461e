"""Host-side converters: raw scan dicts / arrays -> padded device pytrees."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import SlamConfig
from ..types import ImuBatch, PointCloud


def cloud_from_arrays(
    xyz: np.ndarray,
    intensity: np.ndarray,
    ring: np.ndarray,
    rel_time: np.ndarray,
    mask: np.ndarray,
    cap: int,
) -> PointCloud:
    """Pack host arrays into a fixed-capacity PointCloud (truncate/pad)."""
    n = xyz.shape[0]
    take = min(n, cap)
    # keep valid points preferentially
    order = np.argsort(~mask, kind="stable")[:take]

    def pad(a, fill=0):
        out = np.full((cap,) + a.shape[1:], fill, a.dtype)
        out[: len(order)] = a[order]
        return out

    return PointCloud(
        xyz=jnp.asarray(pad(xyz.astype(np.float32))),
        intensity=jnp.asarray(pad(intensity.astype(np.float32))),
        rel_time=jnp.asarray(pad(rel_time.astype(np.float32))),
        ring=jnp.asarray(pad(ring.astype(np.int32))),
        mask=jnp.asarray(pad(mask.astype(bool), fill=False)),
    )


def cloud_from_scan_dict(scan: dict, cfg: SlamConfig) -> PointCloud:
    return cloud_from_arrays(
        scan["xyz"], scan["intensity"], scan["ring"], scan["rel_time"],
        scan["mask"], cfg.max_points,
    )


def imu_from_interval(t: np.ndarray, acc: np.ndarray, gyr: np.ndarray, cap: int) -> ImuBatch:
    m = min(len(t), cap)
    T = np.zeros(cap, np.float32)
    A = np.zeros((cap, 3), np.float32)
    G = np.zeros((cap, 3), np.float32)
    M = np.zeros(cap, bool)
    T[:m], A[:m], G[:m], M[:m] = t[:m], acc[:m], gyr[:m], True
    return ImuBatch(t=jnp.asarray(T), acc=jnp.asarray(A), gyr=jnp.asarray(G), mask=jnp.asarray(M))
