"""Round-4 regression tests: ADVICE r3 fixes + strict-JSON/work-accounting
contract (VERDICT r3 items 5 and ADVICE medium).

Covers:
  * merge_topc no longer raises for pools > rb//2 (auto-raised block /
    XLA fallback) and stays correct;
  * FusedScanIndex.search(c > 256) works end to end on the pallas path;
  * BenchResult.to_json nulls non-finite floats (strict JSON);
  * checked-in results/*.json parse under strict JSON (no NaN tokens);
  * GatedScanIndex rejects metric='ip' (L2-based routing bias);
  * CLI --n-devices with a scan sharded-engine does not demand --graph.
"""

import json
import math
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from gbnns_tpu.eval.bench import BenchResult

REPO = pathlib.Path(__file__).resolve().parent.parent


def _strict_loads(text):
    def die(tok):
        raise ValueError(f"non-strict JSON token: {tok}")
    return json.loads(text, parse_constant=die)


class TestMergeTopcLargePools:
    def _winners(self, n_bins, B, seed=0):
        rng = np.random.default_rng(seed)
        vals = rng.standard_normal((n_bins, B)).astype(np.float32)
        ids = rng.integers(0, 10_000, size=(n_bins, B)).astype(np.int32)
        return jnp.asarray(vals), jnp.asarray(ids)

    @pytest.mark.slow  # ~170-260 s interpret-mode: 3 full hierarchical merges
    @pytest.mark.parametrize("c", [300, 512, 600])
    def test_large_c_no_raise_and_correct(self, c):
        from gbnns_tpu.kernels.scan_topk_pallas import merge_topc

        n_bins, B = 640, 16
        vals, ids = self._winners(n_bins, B)
        v, i = merge_topc(vals, ids, c, valid_b=B, interpret=True)
        cc = min(c, n_bins)
        assert v.shape == (B, cc) and i.shape == (B, cc)
        # exact reference: per-query ascending top-cc of the bin winners
        ref_sel = np.argsort(np.asarray(vals), axis=0, kind="stable")[:cc].T
        ref_ids = np.take_along_axis(np.asarray(ids).T, ref_sel, axis=1)
        got = np.asarray(i)
        # id SETS must match (quantized pallas keys may reorder ties)
        for q in range(B):
            assert set(got[q].tolist()) == set(ref_ids[q].tolist())

    def test_small_c_still_pallas_path(self):
        from gbnns_tpu.kernels.scan_topk_pallas import merge_topc

        vals, ids = self._winners(512, 8)
        v, i = merge_topc(vals, ids, 16, valid_b=8, interpret=True)
        assert v.shape == (8, 16)
        ref = np.sort(np.asarray(vals), axis=0)[:16].T
        np.testing.assert_allclose(np.asarray(v), ref, rtol=1e-3, atol=1e-3)

    def test_fused_index_large_pool(self, fixture_data):
        from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex

        base, query = fixture_data
        idx = FusedScanIndex(base)
        # c=300 > rb//2=256 used to raise ValueError on the pallas merge
        ids, dists = idx.search(query[:8], k=10, c=300, merge="pallas")
        assert ids.shape == (8, 10)
        assert np.all(np.asarray(ids) >= 0)


class TestStrictJSON:
    def test_to_json_nulls_nonfinite(self):
        r = BenchResult(label="x", ef=1, qps=1.0, latency_ms=1.0,
                        recall_at_1=float("nan"), recall_at_10=0.5,
                        n_queries=1, dist_comps_per_query=float("inf"),
                        hops=0, extra={"kept": float("nan")})
        j = r.to_json()
        assert j["recall_at_1"] is None
        assert j["dist_comps_per_query"] is None
        assert j["extra"]["kept"] is None
        _strict_loads(json.dumps(j, allow_nan=False))

    def test_checked_in_results_are_strict(self):
        bad = []
        for p in sorted((REPO / "results").glob("*.json")):
            try:
                _strict_loads(p.read_text())
            except ValueError as e:
                bad.append((p.name, str(e)))
        assert not bad, f"non-strict results artifacts: {bad}"

    def test_checked_in_jsonl_are_strict(self):
        bad = []
        for p in sorted((REPO / "results").glob("*.jsonl")):
            for line in p.read_text().splitlines():
                if not line.strip():
                    continue
                try:
                    _strict_loads(line)
                except ValueError as e:
                    bad.append((p.name, str(e)))
                    break
        assert not bad, f"non-strict results jsonl: {bad}"


class TestGatedIPRejected:
    def test_ip_raises(self, fixture_data):
        from gbnns_tpu.search.gated import GatedScanIndex

        base, _ = fixture_data
        with pytest.raises(ValueError, match="ip"):
            GatedScanIndex(base, metric="ip")


class TestCLIShardedNeedsGraph:
    def test_sharded_scan_engine_needs_no_graph(self, tmp_path, fixture_data):
        """--n-devices 2 --sharded-engine fused must not demand --graph even
        though the single-chip --engine default is 'graph' (ADVICE r3)."""
        from gbnns_tpu.cli import main
        from gbnns_tpu.io.vecs import write_fvecs

        base, query = fixture_data
        bp, qp = tmp_path / "b.fvecs", tmp_path / "q.fvecs"
        write_fvecs(bp, base[:512])
        write_fvecs(qp, query[:32])
        main(["search", "--base", str(bp), "--query", str(qp),
              "--n-devices", "2", "--sharded-engine", "fused",
              "--ef", "8", "--k", "4"])

    def test_single_chip_graph_engine_still_requires_graph(self, tmp_path,
                                                           fixture_data):
        from gbnns_tpu.cli import main
        from gbnns_tpu.io.vecs import write_fvecs

        base, query = fixture_data
        bp, qp = tmp_path / "b.fvecs", tmp_path / "q.fvecs"
        write_fvecs(bp, base[:256])
        write_fvecs(qp, query[:8])
        with pytest.raises(SystemExit):
            main(["search", "--base", str(bp), "--query", str(qp),
                  "--engine", "graph", "--ef", "8", "--k", "4"])
