"""Diagnose the gated scan at 1M: stage timings + gating statistics.

Stages timed separately (pipelined, 5 iters): plan (centroid matmul +
top-P + sort + mask), scan kernel (fixed mask), merge+rerank. Gating
stats: cluster-span histogram, per-QUERY kept-chunk fraction vs
per-TILE kept fraction at several tq, to locate the union blow-up.
"""

from __future__ import annotations

import json
import pathlib
import sys
import threading
import time

_src = str(pathlib.Path(__file__).resolve().parents[1] / "src")
if _src not in sys.path:
    sys.path.insert(0, _src)

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()
    import jax

    from gbnns_tpu.dimred.pca import pca_fit, pca_transform
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import gated_topm_scan
    from gbnns_tpu.search.gated import GatedScanIndex, _plan_queries
    from gbnns_tpu.search.rerank import rerank

    n, B = 1_000_000, 16384
    log = lambda *a: print(*a, flush=True)
    data = make_synthetic(SyntheticSpec(n_base=n, n_query=B, dim=128,
                                        n_clusters=max(64, n // 2000),
                                        seed=0))
    base, query = data["base"], data["query"]
    m = pca_fit(base, 32)
    base_lo, query_lo = pca_transform(m, base), pca_transform(m, query)
    qj, qlo = jnp.asarray(query), jnp.asarray(query_lo)

    idx = GatedScanIndex(base, base_lo)
    spans = (np.asarray(idx.cluster_hi) - np.asarray(idx.cluster_lo) + 1)
    log(f"ncent={idx.stats['ncent']} n_chunks={idx.n_chunks} "
        f"spans: mean={spans.mean():.2f} p50={np.median(spans):.0f} "
        f"max={spans.max()}  hist={np.bincount(spans).tolist()}")

    def timeit(fn, iters=5):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    for probes in (4, 8):
        for tq in (256, 1024):
            order, mask = _plan_queries(qlo, idx.cent, idx.cent_sq,
                                        idx.cluster_lo, idx.cluster_hi,
                                        n_chunks=idx.n_chunks, tq=tq,
                                        probes=probes)
            mk = np.asarray(mask)
            # per-query coverage (tile-independent)
            d = np.asarray(idx.cent_sq)[None, :] - 2.0 * (
                np.asarray(qlo) @ np.asarray(idx.cent).T)
            top = np.argsort(d, axis=1)[:, :probes]
            lo = np.asarray(idx.cluster_lo)[top]
            hi = np.asarray(idx.cluster_hi)[top]
            per_q = (hi - lo + 1).clip(0).sum(1).mean() / idx.n_chunks
            log(f"probes={probes} tq={tq:5d}: per-query~{per_q:.3f} "
                f"(upper bd) tile-kept={mk.mean():.3f}")

    # stage timings at tq=1024, probes=8
    tq = 1024
    order, mask = _plan_queries(qlo, idx.cent, idx.cent_sq, idx.cluster_lo,
                                idx.cluster_hi, n_chunks=idx.n_chunks,
                                tq=tq, probes=8)
    t_plan, _ = timeit(lambda: _plan_queries(
        qlo, idx.cent, idx.cent_sq, idx.cluster_lo, idx.cluster_hi,
        n_chunks=idx.n_chunks, tq=tq, probes=8))
    qlp = qlo[order]
    qfp = qj[order]
    ones = jnp.ones_like(mask)

    t_scan_full, out = timeit(lambda: gated_topm_scan(
        qlp, idx.x_lo, idx.addvec, ones, metric="l2", fine=idx.fine,
        m=idx.m, sub=idx.sub, chunk=idx.chunk, tq=tq))
    vals, ids = out
    t_scan_gated, _ = timeit(lambda: gated_topm_scan(
        qlp, idx.x_lo, idx.addvec, mask, metric="l2", fine=idx.fine,
        m=idx.m, sub=idx.sub, chunk=idx.chunk, tq=tq))

    def merge_rerank():
        _, sel = jax.lax.approx_max_k(-vals, 32, recall_target=0.95)
        cand_pos = jnp.take_along_axis(ids, sel, axis=1)
        sv = jnp.take_along_axis(vals, sel, axis=1)
        pid = idx.perm[cand_pos]
        cand = jnp.where(jnp.isfinite(sv) & (pid >= 0), pid, -1)
        return rerank(qfp, idx.base_full, cand, 10, metric="l2",
                      base_sqnorms=idx.base_sq)
    t_tail, _ = timeit(merge_rerank)

    log(f"plan {t_plan:.1f} ms | scan(all-ones) {t_scan_full:.1f} ms | "
        f"scan(gated p=8, kept={np.asarray(mask).mean():.2f}) "
        f"{t_scan_gated:.1f} ms | merge+rerank {t_tail:.1f} ms")
    pathlib.Path("results/gated_diag_1m.json").write_text(json.dumps(dict(
        spans_hist=np.bincount(spans).tolist(),
        plan_ms=round(t_plan, 1), scan_full_ms=round(t_scan_full, 1),
        scan_gated_ms=round(t_scan_gated, 1), tail_ms=round(t_tail, 1),
        kept_p8_tq1024=float(np.asarray(mask).mean()))))


if __name__ == "__main__":
    main()
