from .io import load_graph, save_graph
from .stats import GraphStats
from .store import PropertyGraph
from .tpch import build_graph

__all__ = [
    "PropertyGraph", "GraphStats", "build_graph", "save_graph", "load_graph",
]
