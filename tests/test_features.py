import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.config import TEST_CONFIG
from rgc_slam_tpu.io import synthetic
from rgc_slam_tpu.io.convert import cloud_from_scan_dict
from rgc_slam_tpu.ops import features as F
from rgc_slam_tpu.ops.covariance import eigh3x3, plane_regularize


CFG = TEST_CONFIG


@pytest.fixture(scope="module")
def scan_and_pose():
    world = synthetic.default_world(0)
    R = np.eye(3)
    t = np.array([0.0, 0.0, 0.56])
    scan = synthetic.cast_scan(world, R, t, n_rings=16, n_azimuth=240, noise=0.005)
    return scan, (R, t)


def test_organize_ring_major(scan_and_pose):
    scan, _ = scan_and_pose
    cloud = cloud_from_scan_dict(scan, CFG)
    org, start, count = F.organize(cloud, CFG)
    m = np.asarray(org.mask)
    rings = np.asarray(org.ring)[m]
    assert (np.diff(rings) >= 0).all(), "rings must be non-decreasing"
    # within each ring, time non-decreasing
    rt = np.asarray(org.rel_time)[m]
    for r in np.unique(rings):
        sel = rings == r
        assert (np.diff(rt[sel]) >= -1e-6).all()
    # counts consistent
    assert int(np.asarray(count).sum()) == m.sum()


def test_extract_runs_and_shapes(scan_and_pose):
    scan, _ = scan_and_pose
    cloud = cloud_from_scan_dict(scan, CFG)
    fx = jax.jit(lambda c: F.extract_features(c, CFG))(cloud)
    assert bool(fx.sharp.mask.any())
    assert bool(fx.flat.mask.any())
    assert fx.sharp.xyz.shape == (CFG.max_sharp_total, 3)
    assert fx.flat.xyz.shape == (CFG.max_flat_total, 3)


def test_ground_plane_quality(scan_and_pose):
    """Sensor 0.56 m above a z=0 world ground: plane distance must be ~0.56
    and normal vertical."""
    scan, _ = scan_and_pose
    cloud = cloud_from_scan_dict(scan, CFG)
    fx = F.extract_features(cloud, CFG)
    g = fx.ground
    assert bool(g.valid)
    nz = abs(float(g.normal[2]))
    assert nz > 0.99, f"ground normal should be vertical, got {np.asarray(g.normal)}"
    assert abs(float(g.distance) - 0.56) < 0.05
    # ground points are actually low
    gm = np.asarray(fx.ground_mask)
    z = np.asarray(fx.full.xyz)[:, 2]
    assert gm.sum() > 100
    assert (z[gm] < 0.0).mean() > 0.95


def test_features_on_structure(scan_and_pose):
    """Edge features should cluster on pillars/box corners (not on ground);
    flat features on walls/ground."""
    scan, _ = scan_and_pose
    cloud = cloud_from_scan_dict(scan, CFG)
    fx = F.extract_features(cloud, CFG)
    sharp = np.asarray(fx.sharp.xyz)[np.asarray(fx.sharp.mask)]
    assert (sharp[:, 2] > -0.4).mean() > 0.9, "sharp features should be off-ground"


def test_feature_determinism(scan_and_pose):
    scan, _ = scan_and_pose
    cloud = cloud_from_scan_dict(scan, CFG)
    a = F.extract_features(cloud, CFG)
    b = F.extract_features(cloud, CFG)
    np.testing.assert_array_equal(np.asarray(a.sharp.mask), np.asarray(b.sharp.mask))
    np.testing.assert_allclose(np.asarray(a.sharp.xyz), np.asarray(b.sharp.xyz))


def test_eigh3x3_matches_lapack(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    S = A @ A.transpose(0, 2, 1) + 0.01 * np.eye(3, dtype=np.float32)
    evals, evecs = eigh3x3(jnp.asarray(S))
    ref_vals = np.linalg.eigvalsh(S)
    np.testing.assert_allclose(np.asarray(evals), ref_vals, rtol=1e-3, atol=1e-3)
    # eigenvector property: S v = lambda v
    for k in range(3):
        v = np.asarray(evecs[..., k])
        lam = np.asarray(evals[..., k])[:, None]
        resid = np.einsum("nij,nj->ni", S, v) - lam * v
        assert np.abs(resid).max() < 2e-2


def test_plane_regularize(rng):
    # a plane-like covariance: large xy, small z
    C = np.diag([1.0, 0.8, 1e-4]).astype(np.float32)[None]
    R = plane_regularize(jnp.asarray(C))
    vals = np.linalg.eigvalsh(np.asarray(R[0]))
    np.testing.assert_allclose(sorted(vals), [1e-3, 1.0, 1.0], atol=1e-4)


def test_vmap_extract(scan_and_pose):
    scan, _ = scan_and_pose
    cloud = cloud_from_scan_dict(scan, CFG)
    batched = jax.tree.map(lambda a: jnp.stack([a, a]), cloud)
    fx = jax.vmap(lambda c: F.extract_features(c, CFG))(batched)
    assert fx.sharp.xyz.shape[0] == 2
