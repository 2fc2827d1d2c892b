from gbnns_tpu.search.walker_jax import beam_search, SearchResult
from gbnns_tpu.search.rerank import rerank
from gbnns_tpu.search.flat import FlatIndex
from gbnns_tpu.search.ivf import IVFIndex

__all__ = ["beam_search", "SearchResult", "rerank", "FlatIndex", "IVFIndex"]
