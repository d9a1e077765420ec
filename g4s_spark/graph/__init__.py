from .stats import GraphStats
from .store import PropertyGraph
from .tpch import build_graph

# graph persistence (write_graph/read_graph) lives in
# g4s_spark.sources.layout — re-exported under the save/load names for
# API discoverability next to the store itself
from ..sources.layout import read_graph as load_graph  # noqa: E402
from ..sources.layout import write_graph as save_graph  # noqa: E402

__all__ = [
    "PropertyGraph", "GraphStats", "build_graph", "save_graph", "load_graph",
]
