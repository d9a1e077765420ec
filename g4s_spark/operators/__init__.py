from .algorithms import bfs, reachable, sssp

__all__ = ["bfs", "sssp", "reachable"]
