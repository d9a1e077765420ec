from .parser import CypherParseError, PatternEdge, QueryGraph, parse

__all__ = ["parse", "QueryGraph", "PatternEdge", "CypherParseError"]
