"""Pallas fused k-NN kernel vs the XLA reference formulation (interpret mode
on CPU; the compiled path is exercised on TPU by bench/production runs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgc_slam_tpu.ops import knn as knn_ops
from rgc_slam_tpu.ops.pallas.knn_kernel import knn_pallas, knn_supported


@pytest.mark.parametrize("Q,N,K", [(200, 512, 5), (64, 256, 1), (130, 384, 3),
                                   (128, 8192, 5),   # multi point-tile path
                                   (96, 5000, 4),    # ragged tile padding
                                   (100, 640, 20)])  # k=20 (gicp/normals path)
def test_matches_xla_reference(rng, Q, N, K):
    q = jnp.asarray(rng.uniform(-10, 10, (Q, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(-10, 10, (N, 3)), jnp.float32)
    m = jnp.asarray(rng.random(N) > 0.1)
    d_ref, i_ref = knn_ops.knn(q, p, m, K)
    d_k, i_k = knn_pallas(q, p, m, K, interpret=True)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_k), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_k))


def test_all_masked(rng):
    q = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(-1, 1, (128, 3)), jnp.float32)
    m = jnp.zeros(128, bool)
    d, i = knn_pallas(q, p, m, 5, interpret=True)
    assert np.isinf(np.asarray(d)).all()
    # indices must stay in [0, n) even for unfilled slots (ADVICE r2): a
    # consumer gating on mask[idx] then reads a real masked column, exactly
    # like the XLA path
    ia = np.asarray(i)
    assert (ia >= 0).all() and (ia < 128).all(), (ia.min(), ia.max())


def test_supported_gate():
    assert knn_supported(2048, 8192, 5)
    assert knn_supported(2048, 32768, 5)         # streaming tiles: no N cap
    assert not knn_supported(512, 2048, 5)       # too small to pay off
    assert not knn_supported(2048, 8000, 5)      # not lane-aligned
    assert knn_supported(2048, 8192, 20)         # gicp/normals k
    assert not knn_supported(2048, 8192, 25)     # k too large
