"""Round-13 debut-gate staging area (started early, in round 11).

Gates here are BUILT AND ORACLE-VERIFIED but must wait for registry
capacity: the registry is 188/190 after the r11 lift, r12 is planned to
lift the two GrB gates from scripts/r12_queue.py (-> exactly 190), and
events_range_stream (also in r12_queue) is already deferred to r13.
Lifting ANYTHING beyond that requires either a retirement with a clean
subsumption (none found in the r11 search — see NOTES.md "r12 capacity
decision") or a deliberate raise of the 190 trip-wire with the
arithmetic documented.

- text_token_bpe: token_count(mode='bpe') — GPT-2-style pre-token
  counts; the lookahead-free pattern is engine-identical in Java regex
  and DuckDB RE2 (cross-checked), so the oracle is exact.
- dedup_semantic: SemDeDup-style semantic deduplication
  (dedup.semantic_dedup, round-11; arXiv:2303.09540) — coarse IVF-cell
  clustering (the ivf_assign_sql-reproducible seeded assignment), then
  within-cell cosine pruning, keep-lowest-id. threshold=0.3 on the
  synthetic embeddings prunes 181/500 rows at sf0.01, so the gate
  exercises the drop path, not just the passthrough.

Verify locally:  python scripts/r13_queue.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from g4s_spark.functions.dedup import semantic_dedup
from g4s_spark.functions.similarity import ivf_assign_sql
from g4s_spark.sources import load_table


def _q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup survivors over the embeddings corpus: one
    representative (lowest vec_id) per within-cell cosine>=0.3 group."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.3)


def _q_text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style pre-token counts (round-11 token_count mode='bpe'):
    the lookahead-free pattern evaluates identically in Java regex and
    DuckDB's RE2 (cross-checked round-11), so the oracle is the same
    regexp_extract_all length."""
    from g4s_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return token_count(docs, mode="bpe")


QUEUE_QUERIES = {
    "dedup_semantic": _q_dedup_semantic,
    "text_token_bpe": _q_text_token_bpe,
}

QUEUE_ORACLES = {
    # same seeded-projection cell assignment as ivf_assign_sql (plan
    # literals both sides), pairwise cosine via list_dot_product with
    # the identical left-to-right accumulation order Spark's
    # F.aggregate uses — bit-stable, like the dedup_embedding gate
    "dedup_semantic": f"""
        WITH cells AS ({ivf_assign_sql()}),
        c AS (
            SELECT e.vec_id AS id, e.embedding AS v, cells.cell
            FROM embeddings e JOIN cells USING (vec_id)
        ),
        drop AS (
            SELECT DISTINCT r.id
            FROM c l JOIN c r ON l.cell = r.cell AND l.id < r.id
            WHERE list_dot_product(l.v, r.v)
                  / (sqrt(list_dot_product(l.v, l.v))
                     * sqrt(list_dot_product(r.v, r.v)))
                  >= 0.3
        )
        SELECT c.id AS vec_id, c.cell FROM c ANTI JOIN drop ON c.id = drop.id
    """,
    # same pattern, same engine semantics (verified Java == RE2 == re)
    "text_token_bpe": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                   text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'
               )) AS BIGINT) AS n_tokens
        FROM documents
    """,
}


def main() -> None:
    sys.path.insert(0, "/root/repo/scripts")
    from check_correctness import run_queue

    run_queue(QUEUE_QUERIES, QUEUE_ORACLES, app_name="r13_queue")


if __name__ == "__main__":
    main()
