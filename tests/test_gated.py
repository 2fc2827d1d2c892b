"""Cluster-gated fused scan (search/gated.py): correctness + gating."""

import numpy as np
import pytest

from gbnns_tpu.eval.recall import recall_at_k
from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
from gbnns_tpu.search.gated import GatedScanIndex


@pytest.fixture(scope="module")
def corpus():
    data = make_synthetic(SyntheticSpec(n_base=4096, n_query=256, dim=32,
                                        n_clusters=32, seed=11))
    base, query = data["base"], data["query"]
    d2 = ((query[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
    return base, query, gt


@pytest.fixture(scope="module")
def index(corpus):
    base, _, _ = corpus
    return GatedScanIndex(base, fine=4, m=16, sub=64, chunk=512, tq=64,
                          kmeans_sample=None)


def test_full_probes_is_near_exact(corpus, index):
    """probes = ncent keeps every cell -> near-exact scan."""
    base, query, gt = corpus
    ids, dists, kept = index.search(query, k=10, c=64, probes=32,
                                    merge="exact", return_kept_frac=True)
    assert kept == 1.0
    r10 = recall_at_k(np.asarray(ids), gt, 10)
    assert r10 >= 0.93, r10
    assert (np.diff(np.asarray(dists), axis=1) >= -1e-5).all()


def test_gating_skips_and_keeps_recall(corpus, index):
    base, query, gt = corpus
    ids, _, kept = index.search(query, k=10, c=64, probes=1,
                                merge="exact", return_kept_frac=True)
    # the fixture has only ~8 chunk-sized clusters, so even 2 probes keep
    # a fair fraction; production geometry (61+ chunks) skips far more
    assert kept < 0.9, f"gating skipped nothing (kept={kept})"
    r10 = recall_at_k(np.asarray(ids), gt, 10)
    # probes=1 scans only the primary cluster's chunk: boundary queries
    # miss across-the-border neighbors — the knob's floor, not a bug
    assert r10 >= 0.75, (r10, kept)


def test_probes_monotone_recall(corpus, index):
    base, query, gt = corpus
    recalls = []
    for p in (1, 4, 32):
        ids, _ = index.search(query, k=10, c=64, probes=p, merge="exact")
        recalls.append(recall_at_k(np.asarray(ids), gt, 10))
    assert recalls[0] <= recalls[1] + 0.02 <= recalls[2] + 0.04, recalls
    assert recalls[-1] >= 0.93


def test_results_in_input_order_and_valid(corpus, index):
    """The internal query sort must be inverted on the way out."""
    base, query, gt = corpus
    ids_all, _ = index.search(query, k=10, c=64, probes=8, merge="exact")
    ids_head, _ = index.search(query[:64], k=10, c=64, probes=8,
                               merge="exact")
    agree = (np.asarray(ids_all)[:64, 0] == np.asarray(ids_head)[:, 0])
    assert agree.mean() >= 0.95    # same queries -> same top-1
    ids = np.asarray(ids_all)
    assert (ids >= -1).all() and (ids < base.shape[0]).all()


def test_metric_angular(corpus):
    """Normalized vectors route correctly (L2 centroid routing is order-
    equivalent to cosine there); raw metric='ip' is rejected because the
    L2-based routing biases probes toward low-norm clusters (ADVICE r3)."""
    base, query, _ = corpus
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = query / np.linalg.norm(query, axis=1, keepdims=True)
    idx = GatedScanIndex(bn, metric="angular", fine=4, m=16, sub=64,
                         chunk=512, tq=64, kmeans_sample=None)
    sims = qn @ bn.T
    gt = np.argsort(-sims, axis=1, kind="stable")[:, :10].astype(np.int32)
    ids, _ = idx.search(qn, k=10, c=64, probes=8, merge="exact")
    r10 = recall_at_k(np.asarray(ids), gt, 10)
    assert r10 >= 0.85, r10
    with pytest.raises(ValueError, match="ip"):
        GatedScanIndex(bn, metric="ip", chunk=512, kmeans_sample=None)
