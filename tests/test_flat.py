import jax.numpy as jnp
import numpy as np
import pytest

from gbnns_tpu.dimred.pca import pca_fit, pca_transform
from gbnns_tpu.eval.recall import recall_at_k
from gbnns_tpu.search.flat import FlatIndex, flat_search


def test_flat_exact_no_projection_is_exact(fixture_data, fixture_gt):
    base, query = fixture_data
    idx = FlatIndex(base, scan_dtype=jnp.float32)
    ids, dists = idx.search(query, k=10, c=32, exact=True)
    assert recall_at_k(np.asarray(ids), fixture_gt, 10) >= 0.999
    d = np.asarray(dists)
    assert (np.diff(d, axis=1) >= -1e-5).all()


def test_flat_projected_with_rerank(fixture_data, fixture_gt):
    base, query = fixture_data
    m = pca_fit(base, 8)
    blo, qlo = pca_transform(m, base), pca_transform(m, query)
    idx = FlatIndex(base, blo)
    ids, _ = idx.search(query, qlo, k=10, c=64)
    r10 = recall_at_k(np.asarray(ids), fixture_gt, 10)
    assert r10 >= 0.85, r10


def test_flat_candidates_monotone_recall(fixture_data, fixture_gt):
    base, query = fixture_data
    m = pca_fit(base, 8)
    blo, qlo = pca_transform(m, base), pca_transform(m, query)
    idx = FlatIndex(base, blo)
    recalls = []
    for c in (10, 40, 160):
        ids, _ = idx.search(query, qlo, k=10, c=c)
        recalls.append(recall_at_k(np.asarray(ids), fixture_gt, 10))
    assert recalls[0] <= recalls[1] + 0.02 <= recalls[2] + 0.04
    assert recalls[-1] >= 0.9


def test_flat_search_fn_direct(fixture_data, fixture_gt):
    base, query = fixture_data
    ids, dists = flat_search(jnp.asarray(query), jnp.asarray(base),
                             jnp.asarray(query), jnp.asarray(base),
                             10, c=16, exact=True, precision="highest")
    assert recall_at_k(np.asarray(ids), fixture_gt, 10) >= 0.999
