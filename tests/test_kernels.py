import jax.numpy as jnp
import numpy as np
import pytest

from gbnns_tpu.kernels.distance import pairwise_dists
from gbnns_tpu.kernels.topk import knn, knn_chunked


def _np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def test_pairwise_l2_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((13, 24)).astype(np.float32)
    x = rng.standard_normal((37, 24)).astype(np.float32)
    got = np.asarray(pairwise_dists(jnp.asarray(q), jnp.asarray(x), metric="l2"))
    np.testing.assert_allclose(got, _np_l2(q, x), rtol=1e-4, atol=1e-4)


def test_pairwise_ip_matches_numpy():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((5, 8)).astype(np.float32)
    x = rng.standard_normal((9, 8)).astype(np.float32)
    got = np.asarray(pairwise_dists(jnp.asarray(q), jnp.asarray(x), metric="ip"))
    np.testing.assert_allclose(got, -(q @ x.T), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk", [128, 256, 1024])
def test_knn_chunked_exact_matches_numpy(chunk):
    rng = np.random.default_rng(2)
    q = rng.standard_normal((31, 16)).astype(np.float32)
    x = rng.standard_normal((700, 16)).astype(np.float32)
    k = 10
    d, i = knn_chunked(jnp.asarray(q), jnp.asarray(x), k, chunk=chunk)
    ref_ids = np.argsort(_np_l2(q, x), axis=1, kind="stable")[:, :k]
    ref_d = np.take_along_axis(_np_l2(q, x), ref_ids, axis=1)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-3, atol=1e-3)
    # ids must match up to ties; compare via distances per id
    got_d = np.take_along_axis(_np_l2(q, x), np.asarray(i), axis=1)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-3, atol=1e-3)


def test_knn_sorted_ascending():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((8, 12)).astype(np.float32)
    x = rng.standard_normal((300, 12)).astype(np.float32)
    d, _ = knn(q, x, 20, chunk=128)
    d = np.asarray(d)
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_knn_query_chunking_consistent():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((50, 16)).astype(np.float32)
    x = rng.standard_normal((400, 16)).astype(np.float32)
    d1, i1 = knn(q, x, 5, chunk=128)
    d2, i2 = knn(q, x, 5, chunk=128, q_chunk=7)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_knn_k_equals_n():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    x = rng.standard_normal((64, 8)).astype(np.float32)
    d, i = knn(q, x, 64, chunk=32)
    i = np.sort(np.asarray(i), axis=1)
    np.testing.assert_array_equal(i, np.tile(np.arange(64), (4, 1)))


def test_knn_ip_metric():
    rng = np.random.default_rng(6)
    q = rng.standard_normal((10, 8)).astype(np.float32)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    _, i = knn(q, x, 3, metric="ip", chunk=64)
    ref = np.argsort(-(q @ x.T), axis=1, kind="stable")[:, :3]
    got_s = np.take_along_axis(q @ x.T, np.asarray(i), axis=1)
    ref_s = np.take_along_axis(q @ x.T, ref, axis=1)
    np.testing.assert_allclose(got_s, ref_s, rtol=1e-4, atol=1e-4)
