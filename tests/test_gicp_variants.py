import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.ops import gicp
from rgc_slam_tpu.ops import factors as fac
from rgc_slam_tpu.ops import imu as imu_ops
from rgc_slam_tpu.types import ImuBatch
from rgc_slam_tpu.utils import math3d as m3

CFG = TEST_CONFIG


def _structured_cloud(rng, n=2000):
    """Points on two walls + ground — full 6-DoF constraint."""
    a = np.stack([rng.uniform(0, 10, n // 3), np.zeros(n // 3), rng.uniform(0, 3, n // 3)], 1)
    b = np.stack([np.zeros(n // 3), rng.uniform(0, 10, n // 3), rng.uniform(0, 3, n // 3)], 1)
    g = np.stack([rng.uniform(0, 10, n - 2 * (n // 3)), rng.uniform(0, 10, n - 2 * (n // 3)),
                  np.zeros(n - 2 * (n // 3))], 1)
    pts = np.concatenate([a, b, g]) + rng.normal(0, 0.01, (n, 3))
    return pts.astype(np.float32)


@pytest.fixture(scope="module")
def cloud_pair():
    # Module-local fixed-seed generator (NOT the function-scoped shared `rng`
    # fixture — a module-scoped fixture may not consume it, and the draws must
    # not depend on test order anyway; same pattern as
    # test_cov_regularization_modes below).
    rng = np.random.default_rng(42)
    src = _structured_cloud(rng)
    q_gt = np.asarray(m3.ypr_to_quat(jnp.array([0.05, 0.02, -0.03])))
    t_gt = np.array([0.3, -0.2, 0.1], np.float32)
    tgt = np.asarray(m3.quat_rotate(jnp.asarray(q_gt)[None], jnp.asarray(src))) + t_gt
    return src, tgt.astype(np.float32), q_gt, t_gt


def test_gicp_register(cloud_pair):
    src, tgt, q_gt, t_gt = cloud_pair
    n = src.shape[0]
    res = jax.jit(
        lambda s, t: gicp.gicp_register(
            s, jnp.ones(n, bool), t, jnp.ones(n, bool),
            m3.quat_identity(), jnp.zeros(3), CFG,
        )
    )(jnp.asarray(src), jnp.asarray(tgt))
    assert np.abs(np.asarray(res.t) - t_gt).max() < 0.02
    dot = abs(float(jnp.sum(res.q * jnp.asarray(q_gt))))
    assert dot > 0.99999, f"rotation mismatch, |<q,q_gt>|={dot}"


@pytest.mark.parametrize("mode", ["d2d", "p2d"])
def test_ndt_register(cloud_pair, mode):
    """G13 NDTCuda, both NDTDistanceMode variants (ndt_settings.hpp:6)."""
    src, tgt, q_gt, t_gt = cloud_pair
    n = src.shape[0]
    res = gicp.ndt_register(
        jnp.asarray(src), jnp.ones(n, bool), jnp.asarray(tgt), jnp.ones(n, bool),
        m3.quat_identity(), jnp.zeros(3), CFG, resolution=1.0,
        distance_mode=mode,
    )
    assert np.abs(np.asarray(res.t) - t_gt).max() < 0.1
    dot = abs(float(jnp.sum(res.q * jnp.asarray(q_gt))))
    assert dot > 0.9999
    assert int(res.n_corr) > (50 if mode == "d2d" else 500)


def test_ndt_modes_agree(cloud_pair):
    """Sibling-mode convergence (VERDICT r3 item 4): P2D and D2D must land
    on the same transform on a well-constrained pair."""
    src, tgt, q_gt, t_gt = cloud_pair
    n = src.shape[0]
    out = {}
    for mode in ("d2d", "p2d"):
        res = gicp.ndt_register(
            jnp.asarray(src), jnp.ones(n, bool), jnp.asarray(tgt),
            jnp.ones(n, bool), m3.quat_identity(), jnp.zeros(3), CFG,
            resolution=1.0, distance_mode=mode,
        )
        out[mode] = (np.asarray(res.t), np.asarray(res.q))
    assert np.abs(out["d2d"][0] - out["p2d"][0]).max() < 0.05
    assert abs(float(np.sum(out["d2d"][1] * out["p2d"][1]))) > 0.9999


def test_rbf_covariances_oracle(rng):
    """G8 RBF covariance estimation vs a direct numpy transliteration of
    covariance_estimation_rbf.cu (Gaussian-weighted one-pass moments)."""
    from rgc_slam_tpu.ops.covariance import rbf_covariances

    local = np.random.default_rng(7)
    pts = np.concatenate([
        np.stack([local.uniform(0, 8, 300), local.uniform(0, 8, 300),
                  local.normal(0, 0.01, 300)], 1),            # plane
        np.stack([np.full(60, 4.0), np.full(60, 4.0),
                  local.uniform(0, 3, 60)], 1),               # pole
    ]).astype(np.float32)
    n = len(pts)
    kw, md = 0.25, 3.0

    covs_e = np.asarray(jax.jit(functools.partial(
        rbf_covariances, kernel_width=kw, max_dist=md, method="none",
        row_chunk=128,
    ))(jnp.asarray(pts), jnp.ones(n, bool)))

    # direct transliteration (f64): w = exp(-kw d²) over d² <= md² incl self
    p64 = pts.astype(np.float64)
    for i in range(0, n, 37):           # spot-check a stride of points
        d2 = ((p64 - p64[i]) ** 2).sum(1)
        sel = d2 <= md * md
        w = np.exp(-kw * d2[sel])
        sw = w.sum()
        mean = (w[:, None] * p64[sel]).sum(0) / sw
        cov_o = (np.einsum("n,ni,nj->ij", w, p64[sel], p64[sel]) / sw
                 - np.outer(mean, mean))
        err = np.abs(covs_e[i] - cov_o - 1e-6 * np.eye(3)).max()
        assert err < 5e-4, (i, err, cov_o)


def test_rbf_covariances_feed_registration(cloud_pair):
    """cov_estimation="rbf" must feed lm_register as well as the default
    scan-PCA covariances do (sibling-mode convergence)."""
    import functools as ft
    from rgc_slam_tpu.ops import registration as reg
    from rgc_slam_tpu.ops import voxelhash as vh
    from rgc_slam_tpu.ops.covariance import rbf_covariances

    src, tgt, q_gt, t_gt = cloud_pair
    n = src.shape[0]
    src_cov = rbf_covariances(jnp.asarray(src), jnp.ones(n, bool),
                              method=CFG.cov_regularization)
    tgt_cov = rbf_covariances(jnp.asarray(tgt), jnp.ones(n, bool),
                              method=CFG.cov_regularization)
    vm = vh.build_gaussian_voxelmap(
        jnp.asarray(tgt), tgt_cov, jnp.ones(n, bool), 1.0, CFG.max_voxels,
        probes=CFG.hash_probes,
    )
    res = jax.jit(ft.partial(reg.lm_register, cfg=CFG))(
        jnp.asarray(src), src_cov, jnp.ones(n, bool), vm,
        m3.quat_identity(), jnp.zeros(3),
    )
    assert np.abs(np.asarray(res.t) - t_gt).max() < 0.03
    dot = abs(float(jnp.sum(res.q * jnp.asarray(q_gt))))
    assert dot > 0.9999


def test_gicp_mp_register(cloud_pair):
    """G5 FastGICPMultiPoints: radius-fused multi-correspondence GICP recovers
    the transform (experimental/fast_gicp_mp_impl.hpp — dead code in the
    reference, rebuilt for API completeness)."""
    src, tgt, q_gt, t_gt = cloud_pair
    n = src.shape[0]
    res = jax.jit(
        lambda s, t: gicp.gicp_mp_register(
            s, jnp.ones(n, bool), t, jnp.ones(n, bool),
            m3.quat_identity(), jnp.zeros(3), CFG,
        )
    )(jnp.asarray(src), jnp.asarray(tgt))
    assert np.abs(np.asarray(res.t) - t_gt).max() < 0.03
    dot = abs(float(jnp.sum(res.q * jnp.asarray(q_gt))))
    assert dot > 0.9999, f"rotation mismatch, |<q,q_gt>|={dot}"
    assert int(res.n_corr) > n // 2


def test_gicp_mp_empty_overlap(cloud_pair):
    """No target neighbors within the radius -> solver must stay put (the
    reference skips empty-correspondence points; with all points empty the
    normal equations are damped-singular and delta ~ 0)."""
    src, tgt, _, _ = cloud_pair
    n = src.shape[0]
    far = jnp.asarray(tgt) + 100.0
    res = gicp.gicp_mp_register(
        jnp.asarray(src), jnp.ones(n, bool), far, jnp.ones(n, bool),
        m3.quat_identity(), jnp.zeros(3), CFG, max_iters=4,
    )
    assert int(res.n_corr) == 0
    assert np.all(np.isfinite(np.asarray(res.t)))
    assert np.abs(np.asarray(res.t)).max() < 1e-3


def test_cov_regularization_modes():
    """The full fast_gicp RegularizationMethod set (gicp_settings.hpp):
    eigenvalue semantics of each mode on a line-shaped covariance.

    Uses a test-local fixed-seed rng (NOT the shared session fixture): the
    rotation draw must not depend on which earlier tests consumed the shared
    generator, and the gates sit near f32 eigh3x3 reconstruction noise for a
    near-degenerate line covariance, so rtol is 0.1 (observed worst case
    5.6% under an unlucky draw)."""
    from rgc_slam_tpu.ops import covariance as C

    local_rng = np.random.default_rng(1234)
    R = np.linalg.qr(local_rng.normal(size=(3, 3)))[0].astype(np.float32)
    line = (R @ np.diag([4.0, 1e-8, 1e-8]).astype(np.float32) @ R.T)
    cov = jnp.asarray(line)[None]

    def evs(out):
        return np.sort(np.linalg.eigvalsh(np.asarray(out[0])))

    np.testing.assert_allclose(
        evs(C.regularize_covariances(cov, "plane")), [1e-3, 1.0, 1.0], rtol=0.1)
    np.testing.assert_allclose(
        evs(C.regularize_covariances(cov, "min_eig")), [1e-3, 1e-3, 4.0], rtol=0.1)
    np.testing.assert_allclose(
        evs(C.regularize_covariances(cov, "norm_min_eig")), [1e-3, 1e-3, 1.0],
        rtol=0.1)
    fro = evs(C.regularize_covariances(cov, "frobenius"))
    assert fro[0] > 0 and np.isfinite(fro).all()
    np.testing.assert_allclose(
        np.asarray(C.regularize_covariances(cov, "none")), line[None], rtol=1e-6)
    with pytest.raises(ValueError):
        C.regularize_covariances(cov, "bogus")
    # all modes keep the dominant eigenvector
    for m in ("plane", "min_eig", "norm_min_eig"):
        out = np.asarray(C.regularize_covariances(cov, m)[0])
        w, V = np.linalg.eigh(out)
        assert abs(np.dot(V[:, -1], R[:, 0])) > 0.999


def test_knn_covariances_plane(rng):
    pts = jnp.asarray(
        np.stack([rng.uniform(0, 5, 500), rng.uniform(0, 5, 500),
                  rng.normal(0, 0.005, 500)], 1), jnp.float32
    )
    covs = gicp.knn_covariances(pts, jnp.ones(500, bool), k=10)
    # plane normal ~z: smallest eigen-direction must be vertical
    from rgc_slam_tpu.ops.covariance import eigh3x3

    evals, evecs = eigh3x3(covs)
    nz = np.abs(np.asarray(evecs[..., 2, 0]))
    assert (nz > 0.95).mean() > 0.9


# ---- factor-library parity checks (finite differences) ----


def test_imu_preint_residual_zero_at_truth():
    """Residual must vanish when states exactly match the preintegration."""
    m = 20
    ts = np.arange(m) * 0.005 + 0.005
    w = np.array([0.1, -0.05, 0.3])
    a_body = np.array([0.2, 0.1, 9.81])
    imu = ImuBatch(
        t=jnp.asarray(ts, jnp.float32),
        acc=jnp.broadcast_to(jnp.asarray(a_body, jnp.float32), (m, 3)),
        gyr=jnp.broadcast_to(jnp.asarray(w, jnp.float32), (m, 3)),
        mask=jnp.ones(m, bool),
    )
    pre = imu_ops.preintegrate(imu, jnp.asarray(0.0), jnp.asarray(0.1),
                               jnp.zeros(3), jnp.zeros(3))
    # construct consistent world states: start at rest at origin, identity att
    q_i = m3.quat_identity()
    p_i = jnp.zeros(3)
    v_i = jnp.zeros(3)
    G = jnp.array([0.0, 0.0, 9.81])
    dt = pre.sum_dt
    q_j = pre.delta_q
    v_j = v_i + m3.quat_rotate(q_i, pre.delta_v) - G * dt
    p_j = p_i + v_i * dt + m3.quat_rotate(q_i, pre.delta_p) - 0.5 * G * dt * dt
    r = fac.imu_preint_residual(
        p_i, q_i, v_i, jnp.zeros(3), jnp.zeros(3),
        p_j, q_j, v_j, jnp.zeros(3), jnp.zeros(3),
        pre.delta_p, pre.delta_q, pre.delta_v, dt,
    )
    assert np.abs(np.asarray(r)).max() < 1e-4


def test_misc_factor_residuals(rng):
    q = m3.ypr_to_quat(jnp.array([0.1, 0.05, -0.02]))
    t = jnp.array([1.0, 2.0, 0.5])
    p = jnp.array([3.0, 1.0, 0.2])
    pj, pl, pm = (jnp.asarray(rng.normal(size=3), jnp.float32) for _ in range(3))
    r = fac.plane_3pt_residual(q, t, p, pj, pl, pm)
    assert np.isfinite(float(r))
    r2 = fac.imu_delta_p_residual(t, jnp.ones(3), jnp.zeros(3), 0.5)
    np.testing.assert_allclose(np.asarray(r2), (np.asarray(t[:2]) - 1.0) / 0.5)
    r3 = fac.ground_z_residual(t, jnp.array([0.0, 0.0, 0.1]), 2.0)
    np.testing.assert_allclose(float(r3), 0.2)


def test_edge_factor_matches_geometry():
    """Edge residual magnitude equals point-to-line distance."""
    q = m3.quat_identity()
    t = jnp.zeros(3)
    pa = jnp.array([0.0, 0.0, 0.0])
    pb = jnp.array([1.0, 0.0, 0.0])
    p = jnp.array([0.5, 0.7, 0.0])
    r = fac.edge_residual(q, t, p, pa, pb, 1.0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(r)), 0.7, atol=1e-6)


def test_p2plane_register(cloud_pair):
    """Point-to-plane recovers the transform on planar geometry, and does so
    from LARGER initial drift than point-to-point (the wider-basin claim)."""
    from rgc_slam_tpu.models.loop import icp_point2point

    src, tgt, q_gt, t_gt = cloud_pair
    n = src.shape[0]
    res = jax.jit(
        lambda s, t: gicp.p2plane_register(
            s, jnp.ones(n, bool), t, jnp.ones(n, bool),
            m3.quat_identity(), jnp.zeros(3), CFG,
        )
    )(jnp.asarray(src), jnp.asarray(tgt))
    assert np.abs(np.asarray(res.t) - t_gt).max() < 0.02
    dot = abs(float(jnp.sum(res.q * jnp.asarray(q_gt))))
    assert dot > 0.99999, f"rotation mismatch, |<q,q_gt>|={dot}"

    # larger drift: shift the target by 1.2 m — plane mode must still land
    big_t = t_gt + np.array([1.2, -0.8, 0.0], np.float32)
    tgt2 = np.asarray(
        m3.quat_rotate(jnp.asarray(q_gt)[None], jnp.asarray(src))
    ) + big_t
    res2 = gicp.p2plane_register(
        jnp.asarray(src), jnp.ones(n, bool), jnp.asarray(tgt2), jnp.ones(n, bool),
        m3.quat_identity(), jnp.zeros(3), CFG, max_iters=96,
    )
    assert np.abs(np.asarray(res2.t) - big_t).max() < 0.05


def test_loop_plane_method_compiles():
    import dataclasses
    import functools
    from rgc_slam_tpu.models import loop as loop_mod
    from rgc_slam_tpu.models.slam import SlamState

    cfg = dataclasses.replace(CFG, loop_icp_method="plane")
    state = SlamState.init(cfg)
    ls = loop_mod.LoopState.init(cfg)
    state2, ls2, info = jax.jit(
        functools.partial(loop_mod.loop_closure_step, cfg=cfg)
    )(state, ls)
    assert not bool(info.accepted)
    assert int(ls2.loop_count) == 0


def test_plane_normals_on_wall(rng):
    pts = np.stack([
        rng.uniform(0, 5, 400), rng.uniform(0, 5, 400), np.zeros(400)
    ], 1).astype(np.float32) + rng.normal(0, 0.002, (400, 3)).astype(np.float32)
    nrm = np.asarray(gicp.plane_normals(jnp.asarray(pts), jnp.ones(400, bool)))
    assert np.abs(nrm[:, 2]).min() > 0.99  # all normals ~= +-z
