from .stats import GraphStats
from .store import PropertyGraph
from .tpch import build_graph

__all__ = [
    "PropertyGraph", "GraphStats", "build_graph", "save_graph", "load_graph",
]


def __getattr__(name: str):
    # graph persistence lives in g4s_spark.sources.layout (which imports
    # THIS package for PropertyGraph) — resolve the save/load aliases
    # lazily so neither import order hits the cycle
    if name == "save_graph":
        from ..sources.layout import write_graph

        return write_graph
    if name == "load_graph":
        from ..sources.layout import read_graph

        return read_graph
    raise AttributeError(name)
