import numpy as np
import jax
import jax.numpy as jnp

from rgc_slam_tpu.ops import voxelhash as vh


def test_pack_unique():
    coords = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], jnp.int32)
    keys = vh.pack_coords(coords, jnp.ones(5, bool))
    assert keys[0] == keys[4]
    assert len(set(np.asarray(keys[:4]).tolist())) == 4


def test_pack_out_of_range():
    coords = jnp.array([[600, 0, 0]], jnp.int32)
    keys = vh.pack_coords(coords, jnp.ones(1, bool))
    assert keys[0] == -1


def test_build_and_lookup():
    rng = np.random.default_rng(123)  # local: hash load is near capacity and
    # the shared session rng makes the point set depend on test order
    pts = jnp.asarray(rng.uniform(-20, 20, (5000, 3)), jnp.float32)
    res = 1.0
    coords = vh.voxel_coords(pts, res)
    keys = vh.pack_coords(coords, jnp.ones(5000, bool))
    ht = vh.build_hash_table(keys, cap=8192)
    slots = np.asarray(ht.slot_of_point)
    assert (slots >= 0).all(), "all points should find a slot"
    # same voxel -> same slot; different voxel -> different slot
    keys_np = np.asarray(keys)
    slot_by_key = {}
    for k, s in zip(keys_np, slots):
        if k in slot_by_key:
            assert slot_by_key[k] == s
        else:
            slot_by_key[k] = s
    assert len(set(slot_by_key.values())) == len(slot_by_key)
    # lookup agrees
    found = vh.lookup_slots(ht.table_keys, keys)
    np.testing.assert_array_equal(np.asarray(found), slots)
    # absent key misses
    q = vh.pack_coords(jnp.array([[400, 400, 400]], jnp.int32), jnp.ones(1, bool))
    assert vh.lookup_slots(ht.table_keys, q)[0] == -1


def test_voxel_downsample_centroids(rng):
    # two clusters in distinct voxels
    a = rng.normal(0, 0.05, (100, 3)) + np.array([0.5, 0.5, 0.5])
    b = rng.normal(0, 0.05, (80, 3)) + np.array([5.5, 0.5, 0.5])
    pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    mask = jnp.ones(180, bool)
    out, omask, _ = vh.voxel_downsample(pts, mask, 2.0, cap=64)
    got = np.asarray(out)[np.asarray(omask)]
    assert got.shape[0] == 2
    cents = sorted(got.tolist())
    np.testing.assert_allclose(cents[0], a.mean(0), atol=0.05)
    np.testing.assert_allclose(cents[1], b.mean(0), atol=0.05)


def test_voxel_downsample_invalid_excluded(rng):
    pts = jnp.asarray(rng.uniform(-5, 5, (50, 3)), jnp.float32)
    mask = jnp.zeros(50, bool)
    out, omask, _ = vh.voxel_downsample(pts, mask, 1.0, cap=64)
    assert not np.asarray(omask).any()


def test_gaussian_voxelmap_stats(rng):
    # voxel v spans [(v+0.5)*res, (v+1.5)*res) under the GaussianVoxelMap
    # half-shifted binning (fast_vgicp_voxel.hpp:158-162) — center the
    # cluster at voxel 0's center (5,5,5) so all points share one voxel
    pts_np = rng.normal(0, 0.1, (200, 3)) + np.array([5.0, 5.0, 5.0])
    pts = jnp.asarray(pts_np, jnp.float32)
    covs = jnp.broadcast_to(jnp.eye(3) * 0.01, (200, 3, 3)).astype(jnp.float32)
    vm = vh.build_gaussian_voxelmap(pts, covs, jnp.ones(200, bool), 5.0, cap=256)
    occupied = np.asarray(vm.num_points) > 0
    assert occupied.sum() == 1
    i = int(np.argmax(occupied))
    np.testing.assert_allclose(np.asarray(vm.mean[i]), pts_np.mean(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vm.cov[i]), np.eye(3) * 0.01, atol=1e-6)
    assert vm.num_points[i] == 200
    # lookup a point inside the voxel
    slot = vh.voxelmap_lookup(vm, jnp.array([[4.5, 5.5, 5.1]], jnp.float32))
    assert slot[0] == i
    slot2 = vh.voxelmap_lookup(vm, jnp.array([[100.0, 0.0, 0.0]], jnp.float32))
    assert slot2[0] == -1


def test_hash_table_jit_and_vmap(rng):
    """The claiming loop must compile and vmap (fleet requirement)."""
    pts = jnp.asarray(rng.uniform(-10, 10, (4, 500, 3)), jnp.float32)

    @jax.jit
    @jax.vmap
    def build(p):
        keys = vh.pack_coords(vh.voxel_coords(p, 1.0), jnp.ones(p.shape[0], bool))
        return vh.build_hash_table(keys, cap=1024).slot_of_point

    slots = build(pts)
    assert (np.asarray(slots) >= 0).all()
