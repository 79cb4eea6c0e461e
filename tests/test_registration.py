import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict
from rgc_slam_tpu.ops import features as F
from rgc_slam_tpu.ops import registration as REG
from rgc_slam_tpu.ops import voxelhash as vh
from rgc_slam_tpu.utils import math3d as m3

CFG = TEST_CONFIG


def _prep(scan):
    cloud = cloud_from_scan_dict(scan, CFG)
    fx = F.extract_features(cloud, CFG)
    return fx


def _downsample_with_covs(fx, res, cap):
    pts, mask, (covs,) = vh.voxel_downsample(
        fx.full.xyz, fx.full.mask, res, cap, extras=(fx.normals_cov,)
    )
    return pts, covs, mask


@pytest.fixture(scope="module")
def pair():
    world = synthetic.default_world(1, extent=15.0)
    Ra = np.eye(3)
    ta = np.array([0.0, 0.0, 0.56])
    yaw = 0.06
    Rb = np.array(
        [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]]
    )
    tb = np.array([0.25, 0.1, 0.56])
    rng = np.random.default_rng(7)
    sa = synthetic.cast_scan(world, Ra, ta, n_azimuth=360, noise=0.004, rng=rng)
    sb = synthetic.cast_scan(world, Rb, tb, n_azimuth=360, noise=0.004, rng=rng)
    # ground truth: T_a_b maps points from b's sensor frame into a's
    R_ab = Ra.T @ Rb
    t_ab = Ra.T @ (tb - ta)
    return sa, sb, R_ab, t_ab


def test_vgicp_recovers_pose(pair):
    sa, sb, R_ab, t_ab = pair
    fa, fb = _prep(sa), _prep(sb)

    # target map from scan a (0.3 m downsample -> 1.0 m gaussian voxels)
    tgt, tgt_cov, tgt_mask = _downsample_with_covs(fa, CFG.target_voxel_size, 4096)
    vm = vh.build_gaussian_voxelmap(
        tgt, tgt_cov, tgt_mask, CFG.vgicp_resolution, CFG.max_voxels
    )
    src, src_cov, src_mask = _downsample_with_covs(fb, CFG.source_voxel_size, CFG.max_source_points)

    res = jax.jit(
        lambda s, c, mvm, mk: REG.lm_register(
            s, c, mk, mvm, m3.quat_identity(), jnp.zeros(3), CFG
        )
    )(src, src_cov, vm, src_mask)

    R_est = np.asarray(m3.quat_to_mat(res.q))
    t_est = np.asarray(res.t)
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(R_est.T @ R_ab) - 1) / 2, -1, 1))
    )
    trans_err = np.linalg.norm(t_est - t_ab)
    assert int(res.n_corr) > 200
    assert rot_err < 0.5, f"rotation error {rot_err} deg"
    assert trans_err < 0.05, f"translation error {trans_err} m"


def test_vgicp_identity_stays_put(pair):
    sa, _, _, _ = pair
    fa = _prep(sa)
    tgt, tgt_cov, tgt_mask = _downsample_with_covs(fa, CFG.target_voxel_size, 4096)
    vm = vh.build_gaussian_voxelmap(
        tgt, tgt_cov, tgt_mask, CFG.vgicp_resolution, CFG.max_voxels
    )
    src, src_cov, src_mask = _downsample_with_covs(fa, CFG.source_voxel_size, CFG.max_source_points)
    res = REG.lm_register(src, src_cov, src_mask, vm, m3.quat_identity(), jnp.zeros(3), CFG)
    assert np.linalg.norm(np.asarray(res.t)) < 0.02
    assert abs(float(res.q[0])) > 0.99999


def test_vgicp_converges_from_bad_guess(pair):
    """With a poor initial guess (no IMU) the solver must still converge\n    within its ~voxel-size basin of attraction."""
    sa, sb, R_ab, t_ab = pair
    fa, fb = _prep(sa), _prep(sb)
    tgt, tgt_cov, tgt_mask = _downsample_with_covs(fa, CFG.target_voxel_size, 4096)
    vm = vh.build_gaussian_voxelmap(
        tgt, tgt_cov, tgt_mask, CFG.vgicp_resolution, CFG.max_voxels
    )
    src, src_cov, src_mask = _downsample_with_covs(fb, CFG.source_voxel_size, CFG.max_source_points)
    q0 = m3.ypr_to_quat(jnp.array([0.12, 0.0, 0.0]))  # ~7 deg yaw off
    res = REG.lm_register(src, src_cov, src_mask, vm, q0, jnp.array([0.4, -0.2, 0.0]), CFG)
    t_err = np.linalg.norm(np.asarray(res.t) - t_ab)
    assert t_err < 0.1, f"translation error {t_err}"


def test_linearize_gradient_matches_autodiff(pair):
    """H/b from the hand-derived Jacobian must match jax.grad of the cost."""
    sa, sb, _, _ = pair
    fa, fb = _prep(sa), _prep(sb)
    tgt, tgt_cov, tgt_mask = _downsample_with_covs(fa, CFG.target_voxel_size, 4096)
    vm = vh.build_gaussian_voxelmap(
        tgt, tgt_cov, tgt_mask, CFG.vgicp_resolution, CFG.max_voxels
    )
    src, src_cov, src_mask = _downsample_with_covs(fb, CFG.source_voxel_size, CFG.max_source_points)
    q = m3.quat_normalize(jnp.array([1.0, 0.01, -0.02, 0.03]))
    t = jnp.array([0.1, -0.05, 0.02])

    H, b, cost, n, corr = REG.vgicp_linearize(
        src, src_cov, src_mask, vm, q, t, CFG.vgicp_max_corr_dist
    )

    def cost_fn(d):
        dq = m3.quat_exp(d[:3])
        qq = m3.quat_mul(dq, q)
        tt = m3.quat_rotate(dq, t) + d[3:]
        return REG.corr_cost(corr, src, qq, tt)

    g = jax.grad(cost_fn)(jnp.zeros(6))
    # cost = sum w e^T M e with M(d) frozen -> grad = 2 J^T M e = 2 b
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(b), rtol=0.05, atol=0.5)


def test_direct7_neighbors(pair):
    """DIRECT7 multi-voxel correspondences: more matches, same-or-better
    registration than DIRECT1 (ref NeighborSearchMethod)."""
    import dataclasses

    sa, sb, R_ab, t_ab = pair
    fa, fb = _prep(sa), _prep(sb)
    tgt, tgt_cov, tgt_mask = _downsample_with_covs(fa, CFG.target_voxel_size, 4096)
    vm = vh.build_gaussian_voxelmap(
        tgt, tgt_cov, tgt_mask, CFG.vgicp_resolution, CFG.max_voxels
    )
    src, src_cov, src_mask = _downsample_with_covs(fb, CFG.source_voxel_size, CFG.max_source_points)
    c1 = REG.find_correspondences(
        src, src_cov, src_mask, vm, m3.quat_identity(), jnp.zeros(3), 2.0,
        neighbors=1,
    )
    c7 = REG.find_correspondences(
        src, src_cov, src_mask, vm, m3.quat_identity(), jnp.zeros(3), 2.0,
        neighbors=7,
    )
    assert int(c7.valid.sum()) > int(c1.valid.sum())
    cfg7 = dataclasses.replace(CFG, neighbor_search=7)
    res = REG.lm_register(src, src_cov, src_mask, vm, m3.quat_identity(), jnp.zeros(3), cfg7)
    t_err = np.linalg.norm(np.asarray(res.t) - t_ab)
    assert t_err < 0.06, f"DIRECT7 translation error {t_err}"
