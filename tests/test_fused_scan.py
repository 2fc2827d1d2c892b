"""Fused Pallas binned-scan kernel (interpret mode on CPU) vs numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gbnns_tpu.eval.recall import recall_at_k
from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex, binned_scan


def _mk(n=2048, d=32, B=64, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(n, d)) * 2.0 - 0.5).astype(np.float32)
    q = rng.normal(size=(B, d)).astype(np.float32)
    return x, q


def _oracle_bins(q, x_bf16, add, bin_size):
    """Numpy replica of the kernel's bin-argmin (bf16 inputs, f32 accum)."""
    q_bf16 = np.asarray(jnp.asarray(q, dtype=jnp.bfloat16)).astype(np.float32)
    scores = add[None, :] - 2.0 * (q_bf16 @ x_bf16.astype(np.float32).T)
    B, n = scores.shape
    sb = scores.reshape(B, n // bin_size, bin_size)
    pos = sb.argmin(-1)
    ids = pos + np.arange(n // bin_size)[None, :] * bin_size
    vals = np.take_along_axis(sb, pos[:, :, None], axis=2)[:, :, 0]
    return vals, ids


@pytest.mark.parametrize("packed", [False, True])
def test_binned_scan_matches_oracle(packed):
    x, q = _mk()
    add = (x ** 2).sum(-1).astype(np.float32)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    vals, ids = binned_scan(jnp.asarray(q), xb, jnp.asarray(add),
                            bin_size=128, chunk=512, tq=64,
                            interpret=True, packed=packed)
    ovals, oids = _oracle_bins(q, np.asarray(xb), add, 128)
    # packed selection quantizes keys (low bits carry the index), so scores
    # within ~2^-13 relative tie and break toward the lower index
    agree = np.asarray(ids) == oids
    assert agree.mean() > 0.99
    np.testing.assert_allclose(np.asarray(vals)[agree], ovals[agree],
                               rtol=5e-3, atol=5e-3)


def test_packed_and_unpacked_agree():
    x, q = _mk(seed=3)
    add = (x ** 2).sum(-1).astype(np.float32)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    kw = dict(bin_size=128, chunk=1024, tq=64, interpret=True)
    v0, i0 = binned_scan(jnp.asarray(q), xb, jnp.asarray(add), packed=False, **kw)
    v1, i1 = binned_scan(jnp.asarray(q), xb, jnp.asarray(add), packed=True, **kw)
    # near-ties (within the key quantization) may pick different winners
    assert (np.asarray(i0) == np.asarray(i1)).mean() > 0.99
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-3,
                               atol=1e-3)


def test_packed_handles_negative_scores():
    # ip metric: scores = -dots, heavily negative — exercises the sign flip
    rng = np.random.default_rng(9)
    x = rng.normal(size=(512, 32)).astype(np.float32) * 10
    q = rng.normal(size=(32, 32)).astype(np.float32) * 10
    add = np.zeros(512, np.float32)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    kw = dict(metric="ip", bin_size=64, chunk=256, tq=32, interpret=True)
    v0, i0 = binned_scan(jnp.asarray(q), xb, jnp.asarray(add), packed=False, **kw)
    v1, i1 = binned_scan(jnp.asarray(q), xb, jnp.asarray(add), packed=True, **kw)
    assert (np.asarray(i0) == np.asarray(i1)).mean() > 0.98
    # packed min must track the true min closely even when all-negative
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-2,
                               atol=1e-2)


def test_fused_index_end_to_end(fixture_data, fixture_gt):
    base, query = fixture_data
    idx = FusedScanIndex(base, bin_size=32, chunk=256, tq=64)
    ids, dists = idx.search(query, k=10, c=64)
    # n=2048 / bin=32 -> 64 bins; with c=64 every bin winner is re-ranked,
    # so only true in-bin collisions cost recall
    assert recall_at_k(np.asarray(ids), fixture_gt, 1) > 0.99
    assert recall_at_k(np.asarray(ids), fixture_gt, 10) > 0.90
    d = np.asarray(dists)
    assert (np.diff(d, axis=1) >= -1e-5).all()


def test_fused_index_padding_never_returned():
    # n NOT a multiple of chunk: padding columns must never win
    rng = np.random.default_rng(2)
    base = rng.normal(size=(700, 16)).astype(np.float32)
    query = rng.normal(size=(16, 16)).astype(np.float32)
    idx = FusedScanIndex(base, bin_size=64, chunk=256, tq=16)
    ids, _ = idx.search(query, k=5, c=16)
    ids = np.asarray(ids)
    assert ids.max() < 700
    assert ids.min() >= 0


def test_shifted_scan_matches_bin_winners():
    """Shifted-key kernel picks the same bin winners as the numpy oracle
    (values are per-query-shifted, so compare ids + recall, not values)."""
    from gbnns_tpu.kernels.scan_topk_pallas import (augment_corpus,
                                                    augment_queries,
                                                    shifted_scan)
    x, q = _mk()
    n = x.shape[0]
    aug = augment_corpus(x, n, "l2")
    vals, ids = shifted_scan(
        augment_queries(jnp.asarray(q), "l2", 1.0),
        jnp.asarray(aug, jnp.bfloat16),
        bin_size=128, chunk=512, tq=64, interpret=True)
    xb = np.asarray(jnp.asarray(x, jnp.bfloat16))
    add = (xb.astype(np.float32) ** 2).sum(-1)
    _, oids = _oracle_bins(q, xb, add, 128)
    # ties/rounding can flip a winner between near-equal rows in a bin
    agree = (np.asarray(ids) == oids).mean()
    assert agree > 0.97
    # shifted values must be monotone with the oracle's ranking per query:
    order = np.argsort(np.asarray(vals), axis=1)
    assert np.asarray(vals).min() > -1e-2


def test_shifted_index_end_to_end(fixture_data, fixture_gt):
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
    base, query = fixture_data
    idx = FusedScanIndex(base, bin_size=32, chunk=256, tq=64,
                         mode="shifted")
    ids, dists = idx.search(query, k=10, c=64)
    assert recall_at_k(np.asarray(ids), fixture_gt, 10) > 0.9


def test_shifted_index_angular(fixture_data, fixture_gt):
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
    base, query = fixture_data
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = query / np.linalg.norm(query, axis=1, keepdims=True)
    idx = FusedScanIndex(bn, metric="angular", bin_size=32, chunk=256,
                         tq=64, mode="shifted")
    ids, _ = idx.search(qn, k=10, c=64)
    d2 = -(qn @ bn.T)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
    assert recall_at_k(np.asarray(ids), gt, 10) > 0.9


def test_prescaled_matches_unscaled():
    """prescaled=True with -2x corpus == the plain l2 path (same winners)."""
    x, q = _mk(seed=5)
    add = (x ** 2).sum(-1).astype(np.float32)
    kw = dict(bin_size=128, chunk=1024, tq=64, interpret=True)
    v0, i0 = binned_scan(jnp.asarray(q), jnp.asarray(x, jnp.bfloat16),
                         jnp.asarray(add), **kw)
    v1, i1 = binned_scan(jnp.asarray(q), jnp.asarray(-2.0 * x, jnp.bfloat16),
                         jnp.asarray(add), prescaled=True, **kw)
    assert (np.asarray(i0) == np.asarray(i1)).mean() > 0.995
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-3,
                               atol=1e-3)


def test_merge_topc_matches_exact_topk():
    from gbnns_tpu.kernels.scan_topk_pallas import merge_topc

    x, q = _mk(seed=5)
    add = (x ** 2).sum(-1).astype(np.float32)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    raw_v, raw_i = binned_scan(jnp.asarray(q), xb, jnp.asarray(add),
                               bin_size=128, chunk=512, tq=64,
                               interpret=True, packed=False,
                               transpose=False)
    B = q.shape[0]
    mv, mi = merge_topc(raw_v, raw_i, 10, valid_b=B, interpret=True)
    assert mv.shape == (B, 10) and mi.shape == (B, 10)
    # oracle: exact stable top-10 of the same bin winners
    tv = np.asarray(raw_v)[:, :B].T
    ti = np.asarray(raw_i)[:, :B].T
    sel = np.argsort(tv, axis=1, kind="stable")[:, :10]
    oids = np.take_along_axis(ti, sel, axis=1)
    ovals = np.take_along_axis(tv, sel, axis=1)
    agree = np.asarray(mi) == oids
    assert agree.mean() > 0.99          # quantization ties at the boundary
    np.testing.assert_allclose(np.asarray(mv)[agree], ovals[agree],
                               rtol=2e-4, atol=2e-4)
    # candidates come out sorted ascending by (quantized) score
    assert (np.diff(np.asarray(mv), axis=1) >= -1e-3).all()


def test_merge_topc_hierarchical_two_stage():
    from gbnns_tpu.kernels.scan_topk_pallas import merge_topc

    # 64 bins with rb=32 forces two reduction stages (64 -> 2*ck -> ck)
    x, q = _mk(n=4096, seed=7)
    add = (x ** 2).sum(-1).astype(np.float32)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    raw_v, raw_i = binned_scan(jnp.asarray(q), xb, jnp.asarray(add),
                               bin_size=64, chunk=512, tq=64,
                               interpret=True, packed=False,
                               transpose=False)
    assert raw_v.shape[0] == 64
    B = q.shape[0]
    mv, mi = merge_topc(raw_v, raw_i, 8, valid_b=B, rb=32, tq=64,
                        interpret=True)
    tv = np.asarray(raw_v)[:, :B].T
    ti = np.asarray(raw_i)[:, :B].T
    sel = np.argsort(tv, axis=1, kind="stable")[:, :8]
    oids = np.take_along_axis(ti, sel, axis=1)
    assert (np.asarray(mi) == oids).mean() > 0.99


def test_binned_scan_int8_matches_oracle():
    """quant=True: kernel bin winners == numpy int32-dot oracle exactly
    (integer matmul is exact; the f32 epilogue is deterministic)."""
    x, q = _mk(n=1024, d=16, B=32, seed=7)
    sx = 127.0 / np.abs(x).max()
    xi = np.clip(np.rint(x * sx), -127, 127).astype(np.int8)
    add = ((xi / sx) ** 2).sum(-1).astype(np.float32)
    sq = 127.0 / np.maximum(np.abs(q).max(axis=1), 1e-30)
    qi = np.clip(np.rint(q * sq[:, None]), -127, 127).astype(np.int8)
    alpha = (-2.0 / (sx * sq)).astype(np.float32)
    vals, ids = binned_scan(jnp.asarray(qi), jnp.asarray(xi),
                            jnp.asarray(add), qshift=jnp.asarray(alpha),
                            quant=True, bin_size=64, chunk=256, tq=32,
                            interpret=True, packed=False)
    dots = qi.astype(np.int32) @ xi.astype(np.int32).T
    scores = add[None, :] + dots.astype(np.float32) * alpha[:, None]
    sb = scores.reshape(32, -1, 64)
    pos = sb.argmin(-1)
    oids = pos + np.arange(sb.shape[1])[None, :] * 64
    ovals = np.take_along_axis(sb, pos[:, :, None], 2)[:, :, 0]
    assert (np.asarray(ids) == oids).mean() > 0.999
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-5, atol=1e-5)


def test_fused_index_int8_scan(fixture_data, fixture_gt):
    """scan_dtype='int8': quantized MXU scan + exact re-rank ~ matches the
    bf16 index's recall on the fixture (per-query dequant preserves each
    query's ranking; int8 rounding is absorbed by the re-rank)."""
    base, query = fixture_data
    idx8 = FusedScanIndex(base, scan_dtype="int8", bin_size=32, chunk=256,
                          tq=64)
    assert idx8.quant and idx8.x_lo.dtype == jnp.int8
    ids8, dists8 = idx8.search(query, k=10, c=64)
    r10 = recall_at_k(np.asarray(ids8), fixture_gt, 10)
    idxb = FusedScanIndex(base, bin_size=32, chunk=256, tq=64)
    idsb, _ = idxb.search(query, k=10, c=64)
    r10b = recall_at_k(np.asarray(idsb), fixture_gt, 10)
    assert r10 > 0.9 and r10 >= r10b - 0.02, (r10, r10b)
    assert (np.diff(np.asarray(dists8), axis=1) >= -1e-5).all()


@pytest.mark.slow  # ~16 s; int8 scan itself is covered fast by test_fused_index_int8_scan
def test_fused_index_int8_merge_pallas(fixture_data, fixture_gt):
    """int8 scan + pallas top-c merge — the exact combination the TPU
    runs — agrees with the int8 + exact-merge path."""
    base, query = fixture_data
    idx = FusedScanIndex(base, scan_dtype="int8", bin_size=32, chunk=256,
                         tq=64)
    ids_p, _ = idx.search(query, k=10, c=64, merge="pallas")
    ids_e, _ = idx.search(query, k=10, c=64, merge="exact")
    assert recall_at_k(np.asarray(ids_p), fixture_gt, 10) > 0.9
    assert (np.asarray(ids_p) == np.asarray(ids_e)).mean() > 0.98


def test_fused_index_int8_angular(fixture_data):
    """int8 scan under angular metric (alpha = -1/(sx*sq) path)."""
    base, query = fixture_data
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = query / np.linalg.norm(query, axis=1, keepdims=True)
    idx = FusedScanIndex(bn, metric="angular", scan_dtype="int8",
                         bin_size=32, chunk=256, tq=64)
    ids, _ = idx.search(qn, k=10, c=64)
    d2 = -(qn @ bn.T)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
    assert recall_at_k(np.asarray(ids), gt, 10) > 0.9


def test_fused_index_bf16_rerank(fixture_data, fixture_gt):
    """rerank_dtype=bf16: only the -2q.x dot term of the re-rank sees the
    rounding (norms stay f32) — recall within 0.02 of the f32 re-rank."""
    import jax.numpy as jnp

    base, query = fixture_data
    idx = FusedScanIndex(base, bin_size=32, chunk=256, tq=64,
                         rerank_dtype=jnp.bfloat16)
    assert idx.base_full.dtype == jnp.bfloat16
    ids, _ = idx.search(query, k=10, c=64)
    r10 = recall_at_k(np.asarray(ids), fixture_gt, 10)
    idxf = FusedScanIndex(base, bin_size=32, chunk=256, tq=64)
    idsf, _ = idxf.search(query, k=10, c=64)
    r10f = recall_at_k(np.asarray(idsf), fixture_gt, 10)
    assert r10 >= r10f - 0.02, (r10, r10f)


def test_fused_index_int8_bf16_rerank_combo(fixture_data, fixture_gt):
    """int8 scan + bf16 re-rank — the bench's fastest measured combo
    (459k QPS at 1M/c=16, results/bench_1m_learned_r4.json): the two
    dtype reductions compose without compounding recall loss beyond the
    bf16-rerank bound."""
    import jax.numpy as jnp

    base, query = fixture_data
    idx = FusedScanIndex(base, bin_size=32, chunk=256, tq=64,
                         scan_dtype="int8", rerank_dtype=jnp.bfloat16)
    assert idx.quant and idx.base_full.dtype == jnp.bfloat16
    ids, _ = idx.search(query, k=10, c=64)
    r10 = recall_at_k(np.asarray(ids), fixture_gt, 10)
    idxf = FusedScanIndex(base, bin_size=32, chunk=256, tq=64)
    idsf, _ = idxf.search(query, k=10, c=64)
    r10f = recall_at_k(np.asarray(idsf), fixture_gt, 10)
    assert r10 >= r10f - 0.03, (r10, r10f)


def test_fused_index_merge_pallas_angular(fixture_data):
    """merge='pallas' under the angular metric (binned mode): agrees with
    merge='exact' — the packed-key merge is metric-agnostic (scores are
    already metric-shaped when they leave the scan)."""
    base, query = fixture_data
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = query / np.linalg.norm(query, axis=1, keepdims=True)
    idx = FusedScanIndex(bn, metric="angular", bin_size=32, chunk=256, tq=64)
    ids_p, _ = idx.search(qn, k=10, c=64, merge="pallas")
    ids_e, _ = idx.search(qn, k=10, c=64, merge="exact")
    d2 = -(qn @ bn.T)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
    assert recall_at_k(np.asarray(ids_p), gt, 10) > 0.9
    assert (np.asarray(ids_p) == np.asarray(ids_e)).mean() > 0.98


def test_fused_index_merge_pallas_end_to_end(fixture_data, fixture_gt):
    base, query = fixture_data
    idx = FusedScanIndex(base, bin_size=32, chunk=256, tq=64)
    ids_p, dists_p = idx.search(query, k=10, c=64, merge="pallas")
    ids_e, _ = idx.search(query, k=10, c=64, merge="exact")
    assert recall_at_k(np.asarray(ids_p), fixture_gt, 10) > 0.90
    # both merges feed the same exact re-rank: results agree up to
    # quantization ties at the pool boundary
    assert (np.asarray(ids_p) == np.asarray(ids_e)).mean() > 0.98
    assert (np.diff(np.asarray(dists_p), axis=1) >= -1e-5).all()


@pytest.mark.parametrize(
    "kw,merge",
    [
        ({}, "exact"),  # fast tier keeps one guard on the segmentation fix
        pytest.param({}, "pallas", marks=pytest.mark.slow),
        pytest.param({"scan_dtype": "int8"}, "exact",
                     marks=pytest.mark.slow),
        pytest.param({"scan_dtype": "int8"}, "pallas",
                     marks=pytest.mark.slow),
    ],
)
def test_interpret_segmented_scan_bit_identical(monkeypatch, kw, merge):
    """Interpret-mode corpus segmentation (the 10M trace-unroll fix) must
    return bit-identical winners to the unsegmented scan: segments are
    chunk-aligned so bins never straddle a boundary, and local ids are
    shifted back to corpus ids. Covers both merge paths and int8 (the
    dtype/merge cross-product is interpret-heavy, ~19 s per combo, so
    only the default combo rides the fast tier)."""
    import gbnns_tpu.kernels.scan_topk_pallas as stp

    rng = np.random.default_rng(7)
    base = rng.normal(size=(1500, 24)).astype(np.float32)
    query = rng.normal(size=(32, 24)).astype(np.float32)

    def run():
        idx = FusedScanIndex(base, bin_size=64, chunk=256, tq=32, **kw)
        assert idx.interpret  # CPU backend in this suite
        return idx.search(query, k=10, c=32, merge=merge)

    monkeypatch.setattr(stp, "_INTERPRET_MAX_CHUNKS", 10 ** 9)
    ids0, d0 = run()
    monkeypatch.setattr(stp, "_INTERPRET_MAX_CHUNKS", 2)  # 512 rows
    ids1, d1 = run()
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_candidates_equals_search_minus_rerank(fixture_data, fixture_gt):
    """``candidates()`` is the documented scan+merge half of ``search``:
    the candidate pool must be duplicate-free valid ids, and its GT-overlap
    recall must equal post-exact-re-rank R@10 (the property
    scripts/train_recipe_ab.py rests on)."""
    base, query = fixture_data
    idx = FusedScanIndex(base, bin_size=32, chunk=256, tq=64)
    for merge in ("exact", "pallas"):
        cand = np.asarray(idx.candidates(query, c=16, merge=merge))
        assert cand.shape == (query.shape[0], 16)
        assert cand.dtype == np.int32
        valid = cand[cand >= 0]
        assert valid.max() < base.shape[0]
        # bin winners are distinct corpus rows: no duplicates per query
        for row in cand:
            r = row[row >= 0]
            assert len(np.unique(r)) == len(r)
        ids, _ = idx.search(query, k=10, c=16, merge=merge)
        gt10 = fixture_gt[:, :10]
        overlap = (cand[:, None, :] == gt10[:, :, None]).any(-1).mean()
        r10 = recall_at_k(np.asarray(ids), fixture_gt, 10)
        assert abs(overlap - r10) < 1e-6
