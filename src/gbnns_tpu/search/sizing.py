"""Resident-HBM sizing for the search engines — the deployment pre-check.

Round 4 hit RESOURCE_EXHAUSTED at GIST shape (1M x 960d -> 128d) only
AFTER a 1008 s graph build (SURVEY §11.5), and the first fail-fast guard
then under-estimated the payload 1.4-8x by rounding rows to 128 words
while the packer pads to whole 4 KB DMA tiles (ADVICE r4 high). This
module is the single source of truth the guard, the scripts, and the
`gbnns size` CLI all share: every formula matches the allocating code
exactly (pack_hop_payload for payload rows; FusedScanIndex/GraphIndex
for corpora).

Reference capability: none — the reference is CPU-resident and never
sizes device memory (SURVEY §2 L0); this is TPU-deployment surface the
rebuild adds.
"""

from __future__ import annotations

from dataclasses import dataclass

# One payload row = whole (8, 128)-f32 tiles = 4 KB DMA units; MUST match
# walker_pallas._ROW_WORDS (imported there from here would be circular, so
# the parity is pinned by tests/test_sizing.py instead).
ROW_WORDS = 1024


def payload_row_bytes(K: int, d_lo: int, *, vec_dtype: str = "bfloat16") -> int:
    """Bytes of ONE packed hop-payload row (pack_hop_payload semantics:
    K neighbor ids + K*d_lo neighbor vectors, padded to 4 KB tiles)."""
    if vec_dtype == "bfloat16":
        if (K * d_lo) % 2:
            raise ValueError(f"bf16 payload needs K*d_lo even "
                             f"(got K={K}, d_lo={d_lo})")
        vec_words = (K * d_lo) // 2
    else:
        vec_words = K * d_lo
    words = -(-(vec_words + K) // ROW_WORDS) * ROW_WORDS
    return 4 * words


@dataclass(frozen=True)
class HbmBreakdown:
    """Per-chip resident bytes for one engine configuration."""

    engine: str
    n: int                    # rows resident on this chip
    payload_bytes: int        # 0 for scan engines
    reduced_bytes: int        # search-space corpus (f32 upload copy)
    rerank_bytes: int         # full-dim re-rank corpus
    graph_bytes: int          # (n, K) int32 adjacency (0 if unused)
    norms_bytes: int          # per-row squared norms (f32)

    @property
    def total_bytes(self) -> int:
        return (self.payload_bytes + self.reduced_bytes + self.rerank_bytes
                + self.graph_bytes + self.norms_bytes)

    def fits(self, hbm_bytes: float, *, headroom: float = 2e9) -> bool:
        """Leave ``headroom`` for scan scratch, jit temporaries, and the
        query batch (measured: ~1-2 GB at B=16384 on the fused engine)."""
        return self.total_bytes <= hbm_bytes - headroom

    def as_dict(self) -> dict:
        d = {f: int(getattr(self, f)) for f in
             ("payload_bytes", "reduced_bytes", "rerank_bytes",
              "graph_bytes", "norms_bytes")}
        d.update(engine=self.engine, n=self.n,
                 total_bytes=int(self.total_bytes),
                 total_gb=round(self.total_bytes / 1e9, 2),
                 fits_v5e_16gb=self.fits(16e9),
                 fits_v4_32gb=self.fits(32e9))
        return d


def graph_index_hbm(n: int, d: int, d_lo: int, K: int, *,
                    vec_dtype: str = "bfloat16",
                    rerank_itemsize: int = 4) -> HbmBreakdown:
    """Resident HBM of a single-chip GraphIndex (payload walker + re-rank).

    Matches GraphIndex.build's allocations: packed payload, f32 reduced
    corpus (seeding/oracle), re-rank corpus at ``rerank_itemsize``
    (4 = f32 default, 2 = rerank_dtype=bf16), f32 norms."""
    return HbmBreakdown(
        engine="graph_pallas", n=n,
        payload_bytes=n * payload_row_bytes(K, d_lo, vec_dtype=vec_dtype),
        reduced_bytes=n * d_lo * 4,
        rerank_bytes=n * d * rerank_itemsize,
        graph_bytes=0,   # adjacency lives inside the payload rows
        norms_bytes=n * 4)


def fused_index_hbm(n: int, d: int, d_lo: int, *,
                    scan_itemsize: int = 2,
                    rerank_itemsize: int = 4) -> HbmBreakdown:
    """Resident HBM of a single-chip FusedScanIndex: scan corpus at
    ``scan_itemsize`` (2 = bf16 default, 1 = int8), re-rank corpus,
    norms. Scan scores never leave VMEM (scan_topk_pallas), so no
    O(n*B) score buffer exists; bin winners are O(B * n/bin)."""
    return HbmBreakdown(
        engine="fused", n=n,
        payload_bytes=0,
        reduced_bytes=n * d_lo * scan_itemsize,
        rerank_bytes=n * d * rerank_itemsize,
        graph_bytes=0,
        norms_bytes=n * 4)


def sharded_per_chip_hbm(n: int, n_chips: int, d: int, d_lo: int, K: int, *,
                         engine: str = "graph_pallas",
                         vec_dtype: str = "bfloat16",
                         rerank_itemsize: int = 4) -> HbmBreakdown:
    """Per-chip residency when the corpus shards n/P per chip
    (search/sharded.py: contiguous shards, queries replicated, one
    all_gather of (B, k) pairs — the collective's footprint is
    negligible next to the corpora)."""
    n_shard = -(-n // n_chips)
    if engine == "fused":
        b = fused_index_hbm(n_shard, d, d_lo,
                            rerank_itemsize=rerank_itemsize)
        # sharded.py keeps base_lo f32 (cast to bf16 inside the jit)
        b = HbmBreakdown(**{**b.__dict__, "reduced_bytes": n_shard * d_lo * 4,
                            "engine": "sharded_fused"})
        return b
    if engine == "graph_pallas":
        g = graph_index_hbm(n_shard, d, d_lo, K, vec_dtype=vec_dtype,
                            rerank_itemsize=rerank_itemsize)
        # sharded indexes also keep the (n_shard, K) int32 local graph
        return HbmBreakdown(**{**g.__dict__,
                               "graph_bytes": n_shard * K * 4,
                               "engine": "sharded_graph_pallas"})
    raise ValueError(f"unknown engine {engine!r}")
