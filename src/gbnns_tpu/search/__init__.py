from gbnns_tpu.search.walker_jax import beam_search, SearchResult
from gbnns_tpu.search.rerank import rerank
from gbnns_tpu.search.flat import FlatIndex
from gbnns_tpu.search.ivf import IVFIndex
from gbnns_tpu.search.graph_index import GraphIndex

__all__ = ["beam_search", "SearchResult", "rerank", "FlatIndex", "IVFIndex",
           "GraphIndex"]
