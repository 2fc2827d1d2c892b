"""Pallas fused distance+top-k kernel: parity vs the numpy oracle and the
XLA streaming path. Runs in interpreter mode on the CPU test backend; the
compiled path is exercised on real TPU by bench/pipeline runs."""

import jax.numpy as jnp
import numpy as np
import pytest

from gbnns_tpu.kernels.distance_topk_pallas import knn_pallas


def _np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


@pytest.mark.parametrize("nq,n,d,k", [(100, 700, 32, 10), (64, 256, 16, 33)])
def test_knn_pallas_matches_oracle(nq, n, d, k):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    dists, ids = knn_pallas(jnp.asarray(q), jnp.asarray(x), k,
                            qt=64, xt=256, interpret=True)
    ref = np.sort(_np_l2(q, x), axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(dists), ref, rtol=1e-3, atol=1e-3)
    got = np.take_along_axis(_np_l2(q, x), np.asarray(ids), axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_knn_pallas_ip_metric():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((32, 16)).astype(np.float32)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    _, ids = knn_pallas(jnp.asarray(q), jnp.asarray(x), 5, metric="ip",
                        qt=32, xt=128, interpret=True)
    scores = q @ x.T
    ref = np.sort(-scores, axis=1)[:, :5]
    got = np.take_along_axis(-scores, np.asarray(ids), axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_knn_pallas_matches_xla_path():
    from gbnns_tpu.kernels.topk import knn_chunked

    rng = np.random.default_rng(2)
    q = rng.standard_normal((80, 24)).astype(np.float32)
    x = rng.standard_normal((500, 24)).astype(np.float32)
    dp, ip_ = knn_pallas(jnp.asarray(q), jnp.asarray(x), 8,
                         qt=64, xt=128, interpret=True)
    dx, ix = knn_chunked(jnp.asarray(q), jnp.asarray(x), 8, chunk=256)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dx),
                               rtol=1e-3, atol=1e-3)


def test_knn_pallas_padding_never_selected():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((10, 8)).astype(np.float32)
    x = rng.standard_normal((100, 8)).astype(np.float32)  # 100 % 128 != 0
    _, ids = knn_pallas(jnp.asarray(q), jnp.asarray(x), 50,
                        qt=8, xt=128, interpret=True)
    assert (np.asarray(ids) < 100).all()
    assert (np.asarray(ids) >= 0).all()
