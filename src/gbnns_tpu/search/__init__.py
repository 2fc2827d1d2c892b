from gbnns_tpu.search.walker_jax import beam_search, SearchResult
from gbnns_tpu.search.rerank import rerank

__all__ = ["beam_search", "SearchResult", "rerank"]
