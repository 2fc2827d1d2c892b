"""A/B the graph-build backends at their real use point (VERDICT r3 item 8).

``build_knn_graph(backend="pallas")`` (kernels/distance_topk_pallas.py,
VMEM-resident fused distance+top-k) has been ~3x slower than the XLA
approx path at k=32 since round 1 (SURVEY §8.2.4). This script measures
all three backends — xla-exact, xla-approx, pallas, fused (binned scan) —
on one corpus and k in {32, 128, 512}: the pallas kernel's claimed niche
is large-k exact sweeps, so the decision (optimize vs demote) needs the
large-k cells, not another k=32 anecdote.

Writes results/build_backend_ab.json: per (backend, k) wall time + edge
overlap vs the exact sweep. One process per run is NOT needed: builds are
few large executions, safe to sequence.

Usage: python scripts/build_backend_ab.py [--n 250000] [--d 32]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import threading
import time

_root = pathlib.Path(__file__).resolve().parents[1]
_src = str(_root / "src")
if _src not in sys.path:
    sys.path.insert(0, _src)

import numpy as np  # noqa: E402


def overlap(a: np.ndarray, b: np.ndarray) -> float:
    """Mean per-row fraction of shared neighbor ids."""
    k = a.shape[1]
    hits = 0
    for i in range(0, a.shape[0], 65536):
        ar, br = a[i:i + 65536], b[i:i + 65536]
        m = (ar[:, :, None] == br[:, None, :]).any(-1)
        hits += int(m.sum())
    return hits / (a.shape[0] * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--ks", type=int, nargs="+", default=[32, 128, 512])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/build_backend_ab.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    if not args.cpu:
        threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                         daemon=True).start()

    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    data = make_synthetic(SyntheticSpec(
        n_base=args.n, n_query=16, dim=args.d,
        n_clusters=max(64, args.n // 2000), seed=0))
    base = data["base"]

    rows = []
    for k in args.ks:
        # raw candidate quality: disable symmetrization+repair so overlap
        # measures the sweep itself, not the shared post-processing
        kw = dict(reverse_frac=0.0, connect=False)
        t0 = time.perf_counter()
        g_exact = build_knn_graph(base, k, backend="xla", exact=True, **kw)
        t_exact = time.perf_counter() - t0
        def pallas_sweep():
            # backend="pallas" was demoted from build_knn_graph after this
            # A/B's own data (round 4); call the kernel directly so the
            # negative stays re-measurable. Measured on the kernel's best
            # footing (advisor r4): corpus padded ONCE to an xt multiple
            # (n_valid carries the logical size) and self-edges removed via
            # _drop_self, not [:, 1:] — duplicates can rank above self.
            from gbnns_tpu.build.knn_graph import _drop_self
            from gbnns_tpu.kernels.distance_topk_pallas import knn_pallas
            xt = 1024
            n_pad = -(-args.n // xt) * xt
            xb = jnp.asarray(np.pad(base, ((0, n_pad - args.n), (0, 0))))
            qb = jnp.asarray(base)  # queries stay unpadded
            parts = []
            for off in range(0, args.n, 8192):
                _, ids = knn_pallas(qb[off:off + 8192], xb, k + 1,
                                    xt=xt, n_valid=args.n)
                parts.append(_drop_self(np.asarray(ids), off))
            return np.concatenate(parts)

        variants = [("xla_approx", dict(backend="xla", exact=False)),
                    ("fused", dict(backend="fused"))]
        if not args.cpu:  # pallas kernel is TPU-geometry; interpret is slow
            variants.append(("pallas", None))
        row = dict(k=k, xla_exact_s=round(t_exact, 2))
        for name, bkw in variants:
            t0 = time.perf_counter()
            g = (pallas_sweep() if bkw is None
                 else build_knn_graph(base, k, **bkw, **kw))
            dt = time.perf_counter() - t0
            row[f"{name}_s"] = round(dt, 2)
            row[f"{name}_overlap"] = round(overlap(g, g_exact), 4)
            log(f"  k={k} {name}: {dt:.2f}s overlap="
                f"{row[f'{name}_overlap']:.4f} (exact {t_exact:.2f}s)")
        rows.append(row)

    out = dict(n=args.n, d=args.d,
               note="pallas backend decision input (SURVEY §8.2.4): keep "
                    "only if it beats xla-exact at large k; overlap vs the "
                    "exact sweep, raw candidates (no symmetrize/repair)",
               rows=rows)
    p = pathlib.Path(args.out)
    p.parent.mkdir(exist_ok=True)
    p.write_text(json.dumps(out, indent=2, allow_nan=False))
    print(json.dumps(dict(out=str(p), rows=len(rows))))


if __name__ == "__main__":
    main()
