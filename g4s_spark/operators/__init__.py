from .algorithms import (
    strongly_connected_components,
    eigenvector_centrality,
    condensation,
    topological_layers,
    k_truss,
    betweenness_centrality,
    reciprocity,
    bfs,
    connected_components,
    pagerank,
    personalized_pagerank,
    reachable,
    sssp,
    k_core,
    hits,
    label_propagation,
    neighborhood_jaccard,
    common_neighbor_scores,
    random_walks,
    weighted_pagerank,
    clustering_coefficient,
    closeness_centrality,
    harmonic_centrality,
    degree_assortativity,
    label_assortativity,
    triangle_count,
)
from .features import neighbor_agg

__all__ = [
    "bfs", "sssp", "reachable", "pagerank", "personalized_pagerank",
    "connected_components", "strongly_connected_components", "eigenvector_centrality", "condensation", "topological_layers", "k_truss", "betweenness_centrality", "reciprocity", "closeness_centrality", "harmonic_centrality", "triangle_count", "clustering_coefficient", "degree_assortativity", "label_assortativity", "k_core", "label_propagation", "hits", "weighted_pagerank", "neighborhood_jaccard", "neighbor_agg", "common_neighbor_scores", "random_walks",
]
