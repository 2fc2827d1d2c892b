"""Recall metrics and exact ground truth.

Capability parity: the reference's evaluation core — Recall@1/Recall@10
against brute-force ground truth (SURVEY.md §3 "Eval harness";
BASELINE.json:2). Ground truth reuses the same streaming MXU kNN kernel as
graph construction (queries x base instead of base x base).
"""

from __future__ import annotations

import numpy as np

from gbnns_tpu.kernels.topk import knn


def exact_ground_truth(queries, base, k: int = 100, *, metric: str = "l2",
                       chunk: int = 65536, q_chunk: int | None = 4096) -> np.ndarray:
    """Exact top-k ids of each query: (nq, k) int32, ascending distance."""
    _, ids = knn(queries, base, k, metric=metric, chunk=chunk,
                 q_chunk=q_chunk, exact=True)
    return np.asarray(ids)


def recall_at_k(pred_ids, gt_ids, k: int) -> float:
    """Fraction of the true top-k found in the predicted top-k (standard
    ANN-benchmarks recall: |pred[:k] ∩ gt[:k]| / k, averaged over queries).

    For k=1 this is exact-NN accuracy; ties beyond position k in gt are not
    credited (same convention as the reference's brute-force GT comparison).
    """
    pred = np.asarray(pred_ids)[:, :k]
    gt = np.asarray(gt_ids)[:, :k]
    if pred.shape[0] != gt.shape[0]:
        raise ValueError(f"query count mismatch {pred.shape} vs {gt.shape}")
    hits = 0
    for p_row, g_row in zip(pred, gt):
        hits += len(np.intersect1d(p_row, g_row, assume_unique=False))
    return hits / (gt.shape[0] * k)
