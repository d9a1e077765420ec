from .algorithms import bfs, connected_components, pagerank, reachable, sssp, triangle_count

__all__ = ["bfs", "sssp", "reachable", "pagerank", "connected_components", "triangle_count"]
