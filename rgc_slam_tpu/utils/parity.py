"""Per-stage parity oracles: numpy transliterations of the reference's
numerically subtle stages (VERDICT r2 item 1 — the instrument for the ≤5%
ATE-parity north star in an image with no real data and no buildable C++).

Each function replays the corresponding C++ loop verbatim (same iteration
order, same gates, same quirks) so tests can assert tight numeric agreement
with the TPU engine:

  * ``reference_ground_fit``            scanRegistration.cpp:307-431
  * ``reference_complementary_filter``  RGC_odometer.cpp:545-625 (+ Mid_Filter
                                        utility.h:206-243, eulerRates2bodyRates
                                        RGC_odometer.cpp:206-220)
  * ``reference_gaussian_voxelmap`` /
    ``reference_vgicp_linearize``       fast_vgicp_voxel.hpp:141-266,
                                        impl/fast_vgicp_impl.hpp:73-214
  * ``reference_lm_vgicp``              impl/lsq_registration_impl.hpp:125-172
  * ``reference_fourdof_residual`` /
    ``reference_pgo_solve``             lidarFactor.hpp:557-595,
                                        RGC_mapping.cpp:2302-2466

Host-side and intentionally slow; deliberately quirk-faithful (e.g. the
Mid_Filter's zero-initialized buffers, the duplicate pushes in the ground
accumulation, the degree-denominated FourDOF parametrization).  ``dtype``
parameters let tests mirror the engine's f32 accumulation where the compare
needs bit-level agreement on branchy schedules (the LM accept trace).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# (a) ground segmentation + weighted PCA plane (scanRegistration.cpp:307-431)
# ---------------------------------------------------------------------------


def reference_ground_fit(
    xyz: np.ndarray,            # [N, 3] flat ring-major organized cloud
    rng: np.ndarray,            # [N] per-point range
    ring_sizes: Sequence[int],  # per-ring point counts (rings contiguous)
    expected_ranges: Sequence[float],   # Ground_scan_range per ring
    ground_scan_rings: int = 7,         # groundScanInd
    range_gate: float = 0.8,
    lidar_height: float = 0.56,         # laderH
    ground_z_max: float = 0.3,
    dtype=np.float64,
) -> Dict[str, np.ndarray]:
    """Exact sequential ground marking + weighted PCA + robustified distance.

    Quirks kept: the neighbor flood window is n ∈ [-5, 5) around each seed
    with the *seed's* ring gate; each passing neighbor is PUSHED again for
    every seed that floods it (duplicates weight the moments and the distance
    pass); flood indices run over the flat array and can cross ring
    boundaries; the planarity check (λ1 > 6 λ0) only prints — it does not
    gate the published plane; and ``i / (groundScanInd-1)`` is C++ INTEGER
    division (both ints), so the ring gate and weight are step functions
    (0.8/1.5 for rings 0..gsi-2, 1.6/0.5 for ring gsi-1), not linear ramps.
    """
    xyz = np.asarray(xyz, dtype)
    rng = np.asarray(rng, dtype)
    n = len(xyz)
    gsi = ground_scan_rings
    marked = np.zeros(n, bool)
    pushes: List[Tuple[int, float]] = []   # (flat index, groundweight)

    start = 0
    for i, size in enumerate(ring_sizes):
        if i >= gsi:
            break
        th = range_gate * (1.0 + i // (gsi - 1))   # C++ int division
        gw = 1.5 - i // (gsi - 1)
        for col in range(5, int(size) - 5):
            ci = start + col
            if abs(rng[ci] - expected_ranges[i]) < th and xyz[ci, 2] < ground_z_max:
                marked[ci] = True
                for off in range(-5, 5):
                    j = ci + off
                    if 0 <= j < n and abs(rng[j] - rng[ci]) < th / 2:
                        marked[j] = True
                        pushes.append((j, gw))
        start += int(size)

    out: Dict[str, np.ndarray] = {
        "marked": marked,
        "groundsize": np.asarray(len(pushes)),
    }
    if not pushes:
        return out

    idx = np.array([p[0] for p in pushes])
    w = np.array([p[1] for p in pushes], dtype)
    pts = xyz[idx]
    wsum = w.sum()
    center = (pts * w[:, None]).sum(axis=0) / wsum
    d = pts - center
    cov = np.einsum("n,ni,nj->ij", w, d, d) / wsum
    evals, evecs = np.linalg.eigh(cov)          # ascending like SelfAdjoint
    normal = evecs[:, 0] / np.linalg.norm(evecs[:, 0])
    if center @ normal < 0:
        normal = -normal
    planarity_ok = evals[1] > 6.0 * evals[0]

    d_unit = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-300)
    dw = 1.0 - 100.0 * np.abs(d_unit @ normal)
    dw = np.where(dw < 0, 0.1, dw)
    gs1 = dw.sum()
    distance = (dw * (pts @ normal)).sum() / gs1
    gs1 = gs1 / len(pushes)
    if distance / lidar_height > 1.1 or distance / lidar_height < 0.9:
        distance = lidar_height
    if gs1 < 0.9:
        distance = 0.9 * lidar_height + 0.1 * distance

    out.update(
        center=center, normal=normal, v1=evecs[:, 1], v2=evecs[:, 2],
        distance=np.asarray(distance), source=np.asarray(1.0 - gs1),
        planarity_ok=np.asarray(planarity_ok), evals=evals,
        weight_of=_scatter_weights(n, idx, w),
    )
    return out


def _scatter_weights(n: int, idx: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Total push weight per flat point index (engine-side comparison aid)."""
    out = np.zeros(n)
    np.add.at(out, idx, w)
    return out


# ---------------------------------------------------------------------------
# (b) complementary attitude filter (RGC_odometer.cpp:545-625)
# ---------------------------------------------------------------------------


class _MidFilter:
    """utility.h:206-243 — ring buffer, bubble sort, middle element.  The
    C++ object is a zero-initialized global, so the median includes the
    buffer's zeros until ``filter_size`` samples have been pushed."""

    def __init__(self, size: int):
        self.buf = np.zeros(size)
        self.size = size
        self.count = 0

    def __call__(self, x: float) -> float:
        self.buf[self.count] = x
        self.count += 1
        if self.count >= self.size:
            self.count = 0
        return float(np.sort(self.buf)[(self.size - 1) // 2])


def _euler_rates_to_body(roll: float, pitch: float) -> np.ndarray:
    """eulerRates2bodyRates (RGC_odometer.cpp:206-220)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    return np.array([[1, 0, -sp], [0, cr, sr * cp], [0, -sr, cr * cp]])


def _ypr2R_deg(ypr_deg: np.ndarray) -> np.ndarray:
    """Utility::ypr2R (utility.h:120-150): degrees in, R = Rz(y)Ry(p)Rx(r)."""
    y, p, r = np.asarray(ypr_deg, float) * np.pi / 180.0
    Rz = np.array([[np.cos(y), -np.sin(y), 0], [np.sin(y), np.cos(y), 0], [0, 0, 1]])
    Ry = np.array([[np.cos(p), 0, np.sin(p)], [0, 1, 0], [-np.sin(p), 0, np.cos(p)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(r), -np.sin(r)], [0, np.sin(r), np.cos(r)]])
    return Rz @ Ry @ Rx


def _norm_angle(a: float) -> float:
    if a > np.pi:
        a -= 2 * np.pi
    elif a < -np.pi:
        a += 2 * np.pi
    return a


def _norm_rollpitch(a: float) -> float:
    """NormalizationRollPitchAngle: HALF wrap — ±π when |angle| > π/2."""
    if a > np.pi / 2:
        a -= np.pi
    elif a < -np.pi / 2:
        a += np.pi
    return a


def reference_complementary_filter(
    t: np.ndarray,              # [M] sample times
    acc: np.ndarray,            # [M, 3] bias-subtracted (handler does acc - ba)
    gyr: np.ndarray,            # [M, 3] bias-subtracted
    gravity: float = 9.81,
) -> Dict[str, np.ndarray]:
    """Exact replay of ``ComplementaryFilter`` over a sample stream.

    The handler (RGC_odometer.cpp:449-486) subtracts the configured biases and
    increments ``count`` BEFORE each call, so sample m (0-based) runs with
    count == m+1.  Returns per-sample roll/pitch/yaw (radians, post-wrap).
    """
    rad2deg = 180.0 / np.pi
    mf_x, mf_y, mf_z = _MidFilter(201), _MidFilter(41), _MidFilter(41)
    roll = pitch = yaw = 0.0
    last_t = 0.0
    first = True
    m = len(t)
    out_r, out_p, out_y = np.zeros(m), np.zeros(m), np.zeros(m)
    out_ax, out_ay, out_az = np.zeros(m), np.zeros(m), np.zeros(m)

    for i in range(m):
        count = i + 1
        d_t = t[i] - last_t
        if first:
            d_t = 0.005
            first = False

        ax = mf_x(acc[i, 0])
        ay = mf_y(acc[i, 1])
        az = mf_z(acc[i, 2])
        k = 0.9 if count < 300 else 0.002

        gx, gy, gz = gyr[i]
        if abs(gz * rad2deg) < 0.2:
            gz = 0.0

        if count > 300:
            Rimu = _ypr2R_deg(np.array([0.0, pitch, roll]) * rad2deg)
            imu_acc = Rimu @ np.array([0.0, 0.0, gravity])
            if abs(ax) > 0.3:
                ratio_x = abs(imu_acc[0]) / abs(ax)
                if ratio_x < 0.8:
                    ax = ratio_x * ax + (1 - ratio_x) * imu_acc[0]
            if abs(ay) > 0.3:
                ratio_y = abs(imu_acc[1]) / abs(ay)
                if ratio_y < 0.8:
                    ay = ratio_y * ay + (1 - ratio_y) * imu_acc[1]

        roll_acc = np.arctan2(ay, az)
        pitch_acc = -np.arctan2(ax, az)

        R_eul2w = _euler_rates_to_body(roll, pitch)
        gx, gy, gz = np.linalg.inv(R_eul2w) @ np.array([gx, gy, gz])

        roll_new = k * roll_acc + (1.0 - k) * (roll + gx * d_t)
        pitch_new = k * pitch_acc + (1.0 - k) * (pitch + gy * d_t)
        yaw_new = yaw + gz / 0.9998 * d_t

        if abs(gz * rad2deg) > 5.0:
            low = 0.005
            roll_new = low * roll_new + (1 - low) * roll
            pitch_new = low * pitch_new + (1 - low) * pitch

        roll = _norm_rollpitch(roll_new)
        pitch = _norm_rollpitch(pitch_new)
        yaw = _norm_angle(yaw_new)
        last_t = t[i]
        out_r[i], out_p[i], out_y[i] = roll, pitch, yaw
        out_ax[i], out_ay[i], out_az[i] = ax, ay, az

    return {"roll": out_r, "pitch": out_p, "yaw": out_y,
            "ax": out_ax, "ay": out_ay, "az": out_az}


# ---------------------------------------------------------------------------
# (c) VGICP voxel map + linearize (fast_vgicp_voxel.hpp / fast_vgicp_impl.hpp)
# ---------------------------------------------------------------------------


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], v.dtype)


def reference_gaussian_voxelmap(
    pts: np.ndarray,            # [N, 3]
    covs: np.ndarray,           # [N, 3, 3]
    resolution: float,
    dtype=np.float64,
) -> Dict[Tuple[int, int, int], Tuple[int, np.ndarray, np.ndarray]]:
    """ADDITIVE GaussianVoxelMap: coord = floor(x/res - 0.5) (the half-voxel
    shift of ``GaussianVoxelMap::voxel_coord``), per-voxel mean of points and
    mean of member covariances.  Returns {coord: (n, mean[3], cov[3,3])}."""
    pts = np.asarray(pts, dtype)
    covs = np.asarray(covs, dtype)
    acc: Dict[Tuple[int, int, int], list] = {}
    for p, c in zip(pts, covs):
        coord = tuple(np.floor(p / resolution - 0.5).astype(int))
        ent = acc.setdefault(coord, [0, np.zeros(3, dtype), np.zeros((3, 3), dtype)])
        ent[0] += 1
        ent[1] = ent[1] + p
        ent[2] = ent[2] + c
    return {k: (n, m / n, c / n) for k, (n, m, c) in acc.items()}


def reference_vgicp_linearize(
    src: np.ndarray,            # [N, 3]
    src_covs: np.ndarray,       # [N, 3, 3]
    vmap: Dict[Tuple[int, int, int], Tuple[int, np.ndarray, np.ndarray]],
    T: np.ndarray,              # [4, 4] target_T_source
    resolution: float,
    with_Hb: bool = True,
    frozen: Optional[list] = None,
    dtype=np.float64,
):
    """``FastVGICP::update_correspondences`` + ``linearize`` (DIRECT1).

    Correspondence = source point's voxel at the transformed position (no
    distance gate in the reference).  Returns (H, b, cost, corr) where corr
    is the frozen correspondence list [(i, mean_B, mahalanobis, w)] reusable
    by ``reference_compute_error`` (the LM accept test re-evaluates cost with
    FROZEN correspondences — fast_gicp freezes them between linearize and
    compute_error).
    """
    T = np.asarray(T, dtype)
    R = T[:3, :3]
    corr = []
    if frozen is None:
        for i in range(len(src)):
            tp = R @ np.asarray(src[i], dtype) + T[:3, 3]
            coord = tuple(np.floor(tp / resolution - 0.5).astype(int))
            hit = vmap.get(coord)
            if hit is None:
                continue
            n_pts, mean_B, cov_B = hit
            RCR = cov_B + R @ np.asarray(src_covs[i], dtype) @ R.T
            mahal = np.linalg.inv(RCR)   # 4x4 form with (3,3)=1 == 3x3 inverse
            corr.append((i, mean_B, mahal, np.sqrt(n_pts)))
    else:
        corr = frozen

    H = np.zeros((6, 6), dtype)
    b = np.zeros(6, dtype)
    cost = dtype(0.0)
    for i, mean_B, mahal, w in corr:
        tp = R @ np.asarray(src[i], dtype) + T[:3, 3]
        err = mean_B - tp
        cost += w * err @ mahal @ err
        if with_Hb:
            J = np.concatenate([_skew(tp), -np.eye(3, dtype=dtype)], axis=1)  # 3x6
            H += w * J.T @ mahal @ J
            b += w * J.T @ mahal @ err
    return H, b, cost, corr


def reference_compute_error(src, corr, T, dtype=np.float64):
    """``FastVGICP::compute_error`` on a frozen correspondence set."""
    T = np.asarray(T, dtype)
    R = T[:3, :3]
    cost = dtype(0.0)
    for i, mean_B, mahal, w in corr:
        tp = R @ np.asarray(src[i], dtype) + T[:3, 3]
        err = mean_B - tp
        cost += w * err @ mahal @ err
    return cost


# ---------------------------------------------------------------------------
# (d) the LM λ-schedule (impl/lsq_registration_impl.hpp:53-172)
# ---------------------------------------------------------------------------


def _so3_exp(omega: np.ndarray) -> np.ndarray:
    """fast_gicp so3_exp (so3.hpp:58-77) -> 3x3 rotation."""
    theta_sq = float(omega @ omega)
    if theta_sq < 1e-10:
        theta_quad = theta_sq * theta_sq
        imag = 0.5 - theta_sq / 48.0 + theta_quad / 3840.0
        real = 1.0 - theta_sq / 8.0 + theta_quad / 384.0
    else:
        theta = np.sqrt(theta_sq)
        imag = np.sin(0.5 * theta) / theta
        real = np.cos(0.5 * theta)
    w, x, y, z = real, *(imag * omega)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def reference_lm_vgicp(
    src: np.ndarray,
    src_covs: np.ndarray,
    tgt: np.ndarray,
    tgt_covs: np.ndarray,
    resolution: float,
    T0: np.ndarray,
    max_iterations: int = 25,
    lm_max_iterations: int = 10,
    lm_init_lambda_factor: float = 1e-9,
    rotation_epsilon: float = 2e-3,
    transformation_epsilon: float = 5e-4,
    dtype=np.float64,
):
    """``LsqRegistration::computeTransformation`` with the LM path: the exact
    λ schedule (init λ = factor·max|diag H|; accept → λ·max(1/3, 1−(2ρ−1)³),
    ν=2; reject → λ·ν, ν·2), frozen-correspondence accept test, elementwise
    |R−I|/|t| convergence.  Returns (T_final, trace) where trace is one dict
    per outer iteration: {y0, n_rejects, accepted, lam_after, converged}.
    """
    vmap = reference_gaussian_voxelmap(tgt, tgt_covs, resolution, dtype)
    x0 = np.asarray(T0, dtype).copy()
    lm_lambda = -1.0
    trace = []
    converged = False

    def is_converged(delta):
        r = np.abs(delta[:3, :3] - np.eye(3)).max() / rotation_epsilon
        tt = np.abs(delta[:3, 3]).max() / transformation_epsilon
        return max(r, tt) < 1.0

    for _ in range(max_iterations):
        if converged:
            break
        H, bvec, y0, corr = reference_vgicp_linearize(
            src, src_covs, vmap, x0, resolution, dtype=dtype
        )
        # note the reference's b has the SAME sign as the engine's: bi = w
        # J^T M err, solved as d = solve(H + λI, -b)
        if lm_lambda < 0.0:
            lm_lambda = lm_init_lambda_factor * np.abs(np.diag(H)).max()

        nu = 2.0
        n_rejects = 0
        accepted = False
        success = False
        for _inner in range(lm_max_iterations):
            d = np.linalg.solve(
                H + lm_lambda * np.eye(6, dtype=dtype), -bvec
            )
            delta = np.eye(4, dtype=dtype)
            delta[:3, :3] = _so3_exp(d[:3])
            delta[:3, 3] = d[3:]
            xi = delta @ x0
            yi = reference_compute_error(src, corr, xi, dtype)
            rho = (y0 - yi) / (d @ (lm_lambda * d - bvec))
            if rho < 0:
                n_rejects += 1
                if is_converged(delta):
                    converged = True
                    success = True
                    break
                lm_lambda = nu * lm_lambda
                nu = 2 * nu
                continue
            x0 = xi
            lm_lambda = lm_lambda * max(1.0 / 3.0, 1 - (2 * rho - 1) ** 3)
            accepted = True
            success = True
            converged = converged or is_converged(delta)
            break
        trace.append(
            dict(y0=float(y0), n_rejects=n_rejects, accepted=accepted,
                 lam_after=float(lm_lambda), converged=bool(converged))
        )
        if not success:   # lm_max_iterations exhausted -> "lm not converged"
            break
    return x0, trace


# ---------------------------------------------------------------------------
# (e) FourDOF residual + dense PGO solve (lidarFactor.hpp:557-595,
#     RGC_mapping.cpp:2302-2466)
# ---------------------------------------------------------------------------


def _norm_deg(a):
    if a > 180.0:
        return a - 360.0
    if a < -180.0:
        return a + 360.0
    return a


def _ypr_deg_to_R(yaw_deg, pitch_deg, roll_deg):
    """YawPitchRollToRotationMatrix (lidarFactor.hpp:518-533)."""
    return _ypr2R_deg(np.array([yaw_deg, pitch_deg, roll_deg]))


def reference_fourdof_residual(
    yaw_i_deg, t_i, yaw_j_deg, t_j, t_meas, relative_yaw_deg, pitch_i_deg, roll_i_deg
) -> np.ndarray:
    """``FourDOFError::operator()`` — angles in DEGREES (the Ceres problem
    parametrizes yaw in degrees; residual[3] is a degree-wrapped angle while
    residuals[0:3] are meters — that unit mix is reference behavior)."""
    t_w_ij = np.asarray(t_j, float) - np.asarray(t_i, float)
    w_R_i = _ypr_deg_to_R(yaw_i_deg, pitch_i_deg, roll_i_deg)
    t_i_ij = w_R_i.T @ t_w_ij
    return np.array(
        [
            t_i_ij[0] - t_meas[0],
            t_i_ij[1] - t_meas[1],
            t_i_ij[2] - t_meas[2],
            _norm_deg(yaw_j_deg - yaw_i_deg - relative_yaw_deg),
        ]
    )


def reference_pgo_solve(
    ypr: np.ndarray,            # [K, 3] keyframe yaw/pitch/roll (radians)
    t: np.ndarray,              # [K, 3]
    loops: Sequence[Tuple[int, int, np.ndarray, float]],
    # each loop: (key_curr i.e. "j"/loop_i, key_loop i.e. "i"/loop_j,
    #             t_rel[3] in the loop keyframe's frame, relative_yaw (rad))
    max_gn_iters: int = 50,
) -> Dict[str, np.ndarray]:
    """``PoseGraphOptimize4DoF``: chain factors from consecutive poses, loop
    factors from the stored constraints, oldest loop keyframe pinned, solved
    densely (numpy lstsq Gauss-Newton stands in for Ceres
    SPARSE_NORMAL_CHOLESKY — same normal equations, exact solve).

    Variables per keyframe: yaw (degrees — the Ceres parametrization) and t.
    Pitch/roll are held at their odometry values inside the factors.
    Returns corrected {"yaw" (rad), "t"}.
    """
    rad2deg = 180.0 / np.pi
    K = len(ypr)
    yaw_deg = ypr[:, 0] * rad2deg
    pitch_deg = ypr[:, 1] * rad2deg
    roll_deg = ypr[:, 2] * rad2deg
    tt = np.asarray(t, float).copy()

    # chain measurements from the current (pre-optimization) poses
    chain = []
    for i in range(1, K):
        R_i = _ypr_deg_to_R(yaw_deg[i - 1], pitch_deg[i - 1], roll_deg[i - 1])
        t_ij = R_i.T @ (tt[i] - tt[i - 1])
        rel_yaw = yaw_deg[i] - yaw_deg[i - 1]   # unwrapped, like the C++
        chain.append((i - 1, i, t_ij, rel_yaw, pitch_deg[i - 1], roll_deg[i - 1]))

    loop_factors = []
    for (ki, kj, t_rel, rel_yaw) in loops:
        loop_factors.append(
            (kj, ki, np.asarray(t_rel, float), rel_yaw * rad2deg,
             pitch_deg[kj], roll_deg[kj])
        )
    if not loop_factors:
        return {"yaw": ypr[:, 0].copy(), "t": tt}
    pinned = min(f[0] for f in loop_factors)

    yawv = yaw_deg.copy()
    tv = tt.copy()

    def residuals_and_jac(yawv, tv):
        rows = []
        J = []
        n_var = 4 * K
        for (a, b, t_meas, rel_yaw, p_a, r_a) in chain + loop_factors:
            r0 = reference_fourdof_residual(
                yawv[a], tv[a], yawv[b], tv[b], t_meas, rel_yaw, p_a, r_a
            )
            rows.append(r0)
            Jrow = np.zeros((4, n_var))
            eps = 1e-6
            for (k, comp) in [(a, "yaw"), (a, "t"), (b, "yaw"), (b, "t")]:
                if comp == "yaw":
                    r1 = reference_fourdof_residual(
                        yawv[a] + (eps if k == a else 0.0), tv[a],
                        yawv[b] + (eps if k == b else 0.0), tv[b],
                        t_meas, rel_yaw, p_a, r_a,
                    )
                    Jrow[:, 4 * k] += (r1 - r0) / eps
                else:
                    for c in range(3):
                        dt = np.zeros(3)
                        dt[c] = eps
                        r1 = reference_fourdof_residual(
                            yawv[a], tv[a] + (dt if k == a else 0.0),
                            yawv[b], tv[b] + (dt if k == b else 0.0),
                            t_meas, rel_yaw, p_a, r_a,
                        )
                        Jrow[:, 4 * k + 1 + c] = (r1 - r0) / eps
            J.append(Jrow)
        return np.concatenate(rows), np.concatenate(J, axis=0)

    free = np.ones(4 * K, bool)
    free[4 * pinned: 4 * pinned + 4] = False
    for it in range(max_gn_iters):
        r, J = residuals_and_jac(yawv, tv)
        Jf = J[:, free]
        dx, *_ = np.linalg.lstsq(Jf, -r, rcond=None)
        full = np.zeros(4 * K)
        full[free] = dx
        yawv = yawv + full[0::4]
        for c in range(3):
            tv[:, c] = tv[:, c] + full[1 + c::4]
        if np.abs(dx).max() < 1e-10:
            break

    return {"yaw": np.array([_norm_angle(y / rad2deg) for y in yawv]), "t": tv}


# ---------------------------------------------------------------------------
# (f) azimuth -> relative sweep time (scanRegistration.cpp:115-207)
# ---------------------------------------------------------------------------


def reference_rel_time(xyz: np.ndarray, dtype=np.float64) -> np.ndarray:
    """Exact sequential transliteration of the projection loop's relTime:
    startOri/endOri with the (pi, 3pi] clamp (cpp:117-127) and the
    halfPassed two-branch angle unwrapping (cpp:186-207).  Quirks kept: the
    trigger point itself keeps its branch-1 angle (the flag is set AFTER
    the current ori is final), and relTime may leave [0, 1]
    (cpp:206 comment: -0.5 < relTime < 1.5)."""
    n = xyz.shape[0]
    start_ori = dtype(-np.arctan2(xyz[0, 1], xyz[0, 0]))
    end_ori = dtype(-np.arctan2(xyz[n - 1, 1], xyz[n - 1, 0])) + 2 * np.pi
    if end_ori - start_ori > 3 * np.pi:
        end_ori -= 2 * np.pi
    elif end_ori - start_ori < np.pi:
        end_ori += 2 * np.pi

    half_passed = False
    rel = np.empty(n, dtype)
    for i in range(n):
        ori = dtype(-np.arctan2(xyz[i, 1], xyz[i, 0]))
        if not half_passed:
            if ori < start_ori - np.pi / 2:
                ori += 2 * np.pi
            elif ori > start_ori + np.pi * 3 / 2:
                ori -= 2 * np.pi
            if ori - start_ori > np.pi:
                half_passed = True
        else:
            ori += 2 * np.pi
            if ori < end_ori - np.pi * 3 / 2:
                ori += 2 * np.pi
            elif ori > end_ori + np.pi / 2:
                ori -= 2 * np.pi
        rel[i] = (ori - start_ori) / (end_ori - start_ori)
    return rel
