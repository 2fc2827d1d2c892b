"""Regression tests for the round-5 advisor/verdict fixes.

Covers: the hbm_budget payload-padding underestimate (ADVICE r4 high),
the bf16 K*d parity fail-fast (ADVICE r4 low), add_reverse_edges on a
zero-edge graph (ADVICE r4 low), and the serving h2d_dtype upload knob
(VERDICT r4 item 3's landed fix).
"""

import numpy as np
import pytest

from gbnns_tpu.build.knn_graph import add_reverse_edges, build_knn_graph
from gbnns_tpu.search.graph_index import GraphIndex
from gbnns_tpu.search.walker_pallas import pack_hop_payload


def _corpus(n=512, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


class TestHbmBudgetEstimate:
    def test_estimate_matches_packer_padding(self):
        """The guard's payload estimate must equal pack_hop_payload's
        actual allocation (rows padded to 4 KB DMA tiles, not 512 B) —
        the round-4 guard undershot 1.4-8x and admitted the exact OOM it
        was added to prevent (ADVICE r4 high)."""
        base = _corpus()
        n, K = base.shape[0], 8
        idx = GraphIndex.build(base, K=K, ncent=None,
                               build_kwargs=dict(chunk=512, node_chunk=512))
        actual_payload = int(np.prod(idx.payload.data.shape)) * 4
        assert idx.stats["payload_bytes"] == actual_payload

    def test_budget_rejects_padded_size(self):
        """A budget between the old (128-word) and correct (1024-word)
        estimates must now be rejected BEFORE the graph build."""
        base = _corpus()
        n, K, d = base.shape[0], 8, base.shape[1]
        vec_words = (K * d) // 2
        old_est_rows = -(-(vec_words + K) // 128) * 128      # 128 words
        new_est_rows = -(-(vec_words + K) // 1024) * 1024    # 1024 words
        assert new_est_rows > old_est_rows  # the case that regressed
        budget = 4 * n * ((old_est_rows + new_est_rows) // 2)
        with pytest.raises(MemoryError, match="exceeds budget"):
            GraphIndex.build(base, K=K, ncent=None, hbm_budget=budget)

    def test_bf16_parity_fails_fast(self):
        """K*d_lo odd with a bf16 payload must raise at GraphIndex.build
        entry, not after the expensive graph build inside the packer."""
        base = _corpus(d=15)  # K=3 * 15 = 45, odd
        with pytest.raises(ValueError, match="K\\*d_lo even"):
            GraphIndex.build(base, K=3, ncent=None)


class TestAddReverseEdgesDegenerate:
    def test_all_invalid_adjacency(self):
        """A graph with zero valid edges (all -1) must round-trip as a
        copy instead of IndexError-ing on the empty reverse-CSR gather."""
        g = np.full((16, 4), -1, np.int32)
        out = add_reverse_edges(g, frac=0.5)
        np.testing.assert_array_equal(out, g)
        assert out is not g  # still a copy, matching the normal path

    def test_normal_graph_unchanged_semantics(self):
        base = _corpus(n=128, d=8)
        g = build_knn_graph(base, 4, reverse_frac=0.0, connect=False,
                            chunk=128, node_chunk=128)
        out = add_reverse_edges(g, frac=0.5)
        # nearest half of each row is preserved verbatim
        np.testing.assert_array_equal(out[:, :2], g[:, :2])


class TestServeH2dDtype:
    @pytest.fixture(scope="class")
    def tiny(self):
        rng = np.random.default_rng(3)
        base = rng.standard_normal((1024, 16)).astype(np.float32)
        query = base[:32] + 0.01 * rng.standard_normal((32, 16)).astype(
            np.float32)
        d2 = ((query[:, None] - base[None]) ** 2).sum(-1)
        gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
        return base, query, gt

    def test_bf16_upload_recall_parity(self, tiny):
        from gbnns_tpu.eval.recall import recall_at_k
        from gbnns_tpu.serve import SearchService

        base, query, gt = tiny
        svc32 = SearchService(base, engine="flat", c=32)
        svcbf = SearchService(base, engine="flat", c=32,
                              h2d_dtype="bfloat16")
        try:
            ids32, _ = svc32.submit(query, None, 10)
            idsbf, _ = svcbf.submit(query, None, 10)
            r32 = recall_at_k(ids32, gt, 10)
            rbf = recall_at_k(idsbf, gt, 10)
            assert rbf >= r32 - 0.01, (rbf, r32)
        finally:
            svc32.stop()
            svcbf.stop()

    def test_bad_dtype_rejected(self, tiny):
        from gbnns_tpu.serve import SearchService

        base, _, _ = tiny
        with pytest.raises(ValueError, match="h2d_dtype"):
            SearchService(base, engine="flat", h2d_dtype="float16")
