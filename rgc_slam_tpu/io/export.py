"""Map / trajectory / visualization exports (SURVEY A16-A18).

The reference's observability surface is rviz topics + file dumps:
  * A16 high-rate pose republisher (RGC_mapping.cpp:403-631) — compose every
    odometry pose with the current map->odom correction: ``compose_map_pose``.
  * A17 global map publisher (RGC_mapping.cpp:2468-2565) — uniform-sample
    keyframes, re-transform their clouds, voxel-downsample: ``global_map``.
  * A18 loop-constraint markers + robot marker (RGC_mapping.cpp:687-732,
    2227-2300) — exported as line-segment lists: ``loop_edges``.
  * per-keyframe PCD dumps (RGC_mapping.cpp:1933-1936) — ``write_pcd``.

rviz itself is out of scope of the engine; everything here lands in standard
PCD/PLY/TUM files any point-cloud viewer opens.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import SlamConfig
from ..models.mapping import MappingState
from ..utils import math3d as m3


def compose_map_pose(q_md, t_md, q_odom, t_odom):
    """Map-frame pose for a raw odometry pose (A16's transform composition)."""
    q = m3.quat_normalize(m3.quat_mul(q_md, q_odom))
    t = t_md + m3.quat_rotate(q_md, t_odom)
    return q, t


def global_map(
    ms: MappingState,
    cfg: SlamConfig,
    sample_dist: float = 0.5,
    density: float = 0.2,
    cap: int = 1 << 18,
) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble the global map (A17): keyframes uniform-sampled by position
    (>= sample_dist apart), clouds re-transformed by their (loop-corrected)
    poses, voxel-downsampled at ``density``.  Host-side (export path)."""
    n_kf = int(ms.kf_count)
    if n_kf == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0,), np.float32)
    kf_t = np.asarray(ms.kf_t[:n_kf])
    # uniform sampling on keyframe positions (ref globalMapVisualizationPoseDensity)
    chosen = []
    for i in range(n_kf):
        if not chosen or np.linalg.norm(kf_t[i] - kf_t[chosen[-1]]) >= sample_dist:
            chosen.append(i)
    pts_all, conf_all = [], []
    for i in chosen:
        q = jnp.asarray(ms.kf_q[i])
        t = jnp.asarray(ms.kf_t[i])
        for cloud, confs, mask in (
            (ms.kf_corner[i], ms.kf_corner_conf[i], ms.kf_corner_mask[i]),
            (ms.kf_surf[i], ms.kf_surf_conf[i], ms.kf_surf_mask[i]),
        ):
            w = m3.quat_rotate(q[None, :], jnp.asarray(cloud)) + t[None, :]
            msk = np.asarray(mask)
            pts_all.append(np.asarray(w)[msk])
            conf_all.append(np.asarray(confs)[msk])
    pts = np.concatenate(pts_all).astype(np.float32)
    conf = np.concatenate(conf_all).astype(np.float32)
    # final voxel downsample at export density
    if len(pts) > 0:
        origin = pts.mean(0)
        keys = {}
        inv = 1.0 / density
        out_p, out_c = [], []
        cells = np.floor((pts - origin) * inv).astype(np.int64)
        _, first = np.unique(cells, axis=0, return_index=True)
        out = pts[np.sort(first)][:cap]
        outc = conf[np.sort(first)][:cap]
        return out, outc
    return pts, conf


def write_keyframe_pcds(ms: MappingState, out_dir: str):
    """Per-keyframe corner/surf PCD dumps (ref RGC_mapping.cpp:1933-1936)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    n_kf = int(ms.kf_count)
    for i in range(n_kf):
        cm = np.asarray(ms.kf_corner_mask[i])
        sm = np.asarray(ms.kf_surf_mask[i])
        write_pcd(
            os.path.join(out_dir, f"corner_{i:06d}.pcd"),
            np.asarray(ms.kf_corner[i])[cm],
            np.asarray(ms.kf_corner_conf[i])[cm],
        )
        write_pcd(
            os.path.join(out_dir, f"surf_{i:06d}.pcd"),
            np.asarray(ms.kf_surf[i])[sm],
            np.asarray(ms.kf_surf_conf[i])[sm],
        )


def loop_edges(ms: MappingState, loop_state) -> np.ndarray:
    """Loop-constraint line segments [L, 2, 3] (A18's MarkerArray)."""
    li = np.asarray(loop_state.loop_i)
    lj = np.asarray(loop_state.loop_j)
    ok = (li >= 0) & (lj >= 0)
    kf_t = np.asarray(ms.kf_t)
    return np.stack([kf_t[li[ok]], kf_t[lj[ok]]], axis=1)


def write_pcd(path: str, xyz: np.ndarray, intensity: Optional[np.ndarray] = None):
    """Binary PCD v0.7 writer (the reference dumps per-keyframe PCDs via PCL)."""
    n = len(xyz)
    fields = "x y z" + (" intensity" if intensity is not None else "")
    count = 4 if intensity is not None else 3
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {' '.join(['4'] * count)}\n"
        f"TYPE {' '.join(['F'] * count)}\n"
        f"COUNT {' '.join(['1'] * count)}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        "DATA binary\n"
    )
    data = xyz.astype("<f4")
    if intensity is not None:
        data = np.concatenate([data, intensity.astype("<f4")[:, None]], axis=1)
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(data.tobytes())


def read_pcd(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Minimal binary/ascii PCD reader (x y z [intensity])."""
    with open(path, "rb") as f:
        header = {}
        n_fields = 3
        while True:
            line = f.readline().decode().strip()
            if line.startswith("FIELDS"):
                n_fields = len(line.split()) - 1
            for key in ("POINTS", "DATA"):
                if line.startswith(key):
                    header[key] = line.split(maxsplit=1)[1]
            if line.startswith("DATA"):
                break
        n = int(header["POINTS"])
        if header["DATA"] == "binary":
            arr = np.frombuffer(f.read(n * n_fields * 4), dtype="<f4").reshape(n, n_fields)
        else:
            arr = np.loadtxt(f, dtype=np.float32).reshape(n, n_fields)
    xyz = arr[:, :3]
    inten = arr[:, 3] if n_fields > 3 else None
    return xyz, inten
