import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops.knn import knn_dist2, mean_dist2_knn3


def brute_knn(points, k, mask=None):
    n = len(points)
    d = ((points[:, None] - points[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    if mask is not None:
        d[:, ~mask] = np.inf
    d.sort(axis=1)
    return d[:, :k]


def test_matches_bruteforce(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    got = np.asarray(knn_dist2(jnp.asarray(pts), k=3, chunk_q=128, chunk_k=64))
    want = brute_knn(pts, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mask(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    mask = rng.uniform(size=100) > 0.3
    got = np.asarray(knn_dist2(jnp.asarray(pts), mask=jnp.asarray(mask),
                               k=3, chunk_q=32, chunk_k=32))
    want = brute_knn(pts, 3, mask)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-5)
    assert np.all(got[~mask] >= 1e11)  # masked queries get sentinel


def test_duplicates_count_as_neighbors():
    pts = np.zeros((5, 3), np.float32)
    pts[3:] = 1.0
    got = np.asarray(knn_dist2(jnp.asarray(pts), k=3, chunk_q=8, chunk_k=8))
    # point 0 has duplicates 1,2 at dist 0 and 3 at dist 3
    np.testing.assert_allclose(got[0], [0.0, 0.0, 3.0], atol=1e-6)


def test_mean_dist2_grid():
    # regular 1D chain with spacing 1: each interior point's 3 NNs are at
    # squared distances 1, 1, 4 -> mean 2
    pts = np.stack([np.arange(10, dtype=np.float32),
                    np.zeros(10, np.float32), np.zeros(10, np.float32)], -1)
    got = np.asarray(mean_dist2_knn3(jnp.asarray(pts)))
    np.testing.assert_allclose(got[4], 2.0, atol=1e-5)


def test_nonpow2_sizes(rng):
    pts = rng.normal(size=(173, 3)).astype(np.float32)
    got = np.asarray(knn_dist2(jnp.asarray(pts), k=3, chunk_q=64, chunk_k=48))
    want = brute_knn(pts, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
