"""g4s_spark — a PySpark-native analytics/graph engine with the query and
data-processing capabilities of the reference engine (fabianmurariu/g4s).

The reference compiles a subset of openCypher into sparse boolean matrix
algebra (GraphBLAS). Here the same semantics are expressed Spark-first:

- a sparse matrix is a DataFrame ``(i, j, v)`` (``g4s_spark.grblas``),
- a semiring ``mxm`` is a join + groupBy-agg parameterized by (⊕, ⊗),
- a property graph is a pair of DataFrames ``nodes(id,label,...)`` /
  ``edges(src,dst,type,...)`` (``g4s_spark.graph``),
- a Cypher pattern match is a chain of equi-joins / semi-joins with
  existence (ANY_PAIR) semantics enforced by per-hop duplicate dropping
  (``g4s_spark.plans``),
- iterative algorithms (BFS, SSSP) are DataFrame fixpoint loops
  (``g4s_spark.operators.algorithms``).

Beyond reference parity, ``g4s_spark.functions`` adds large-scale
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) and ``g4s_spark.streaming`` adds Structured Streaming
variants over the events table.
"""

__version__ = "0.1.0"
