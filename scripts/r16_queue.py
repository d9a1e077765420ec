"""Round-16 debut-gate staging area (successor to r15_queue.py — the
r15 debut graph_random_walks LANDED in __spark_entry__ in round 15;
git history keeps the old file).

Registry state after round 15: 191 live gates (graph_random_walks
debuted +1, text_vocab retired -1 — RETIRED_GATES.json), so ONE debut
slot is open before the 192 D=2 trip-wire binds again. Staged here:

- pipeline_dsir: DSIR importance weights (Xie et al. 2023,
  arXiv:2302.03169) — hashed-unigram bucket distributions of a target
  corpus (lang='en' documents) vs the raw corpus, per-document
  log-importance scores. The md5 bucketing is byte-identical across
  Spark/DuckDB (sampling._md5_bucket), so the oracle reproduces the
  full computation; ln is the single transcendental, rounded at the
  gate boundary like the harmonic/z-score gates.

- sample_gumbel_topk (r17 candidate): Gumbel top-k weighted sampling
  without replacement (Kool 2019 / Efraimidis-Spirakis in log space).

- dedup_containment (r18 candidate): directional shingle containment
  (Broder 1997) — the decontamination shape symmetric Jaccard misses;
  one pair aggregation, both directions folded out of an inline array.

Verify locally:  python scripts/r16_queue.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g4s_spark.sources import load_table

N_BUCKETS = 8192


def _q_pipeline_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log-importance of every document against the English
    sub-corpus as the target: high scores = most target-like. Rounded
    to 6 decimals (ln last-ulp parity, like graph_harmonic)."""
    from g4s_spark.functions.pipeline import dsir_log_weights

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_log_weights(docs, target, n_buckets=N_BUCKETS)
    return w.select(
        "doc_id",
        "n_feat",
        (F.floor(F.col("log_weight") * 1000000 + F.lit(0.5)) / 1000000).alias(
            "log_weight"
        ),
    )


_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_BUCKET = (
    "CAST(('0x' || substr(md5('0:' || tok), 1, 8)) AS BIGINT) % " + str(N_BUCKETS)
)

DSIR_ORACLE = f"""
    WITH raw_tok AS (
        SELECT doc_id, u.tok FROM (SELECT doc_id, {_TOKS} AS ts FROM documents),
        unnest(ts) AS u(tok)
    ),
    tgt_tok AS (
        SELECT u.tok FROM (SELECT {_TOKS} AS ts FROM documents WHERE lang = 'en'),
        unnest(ts) AS u(tok)
    ),
    rawb AS (SELECT {_BUCKET} AS bucket, count(*) AS r_n FROM raw_tok GROUP BY 1),
    tgtb AS (SELECT {_BUCKET} AS bucket, count(*) AS t_n FROM tgt_tok GROUP BY 1),
    rt AS (SELECT sum(r_n) AS rt FROM rawb),
    tt AS (SELECT sum(t_n) AS tt FROM tgtb),
    ratio AS (
        SELECT rawb.bucket,
               ln((coalesce(t_n, 0) + 1.0) / (tt + {N_BUCKETS}.0))
               - ln((r_n + 1.0) / (rt + {N_BUCKETS}.0)) AS lr
        FROM rawb LEFT JOIN tgtb ON rawb.bucket = tgtb.bucket, rt, tt
    ),
    docb AS (
        SELECT doc_id, {_BUCKET} AS bucket, count(*) AS c
        FROM raw_tok GROUP BY 1, 2
    )
    SELECT d.doc_id, CAST(sum(c) AS BIGINT) AS n_feat,
           floor(sum(c * lr) * 1000000 + 0.5) / 1000000 AS log_weight
    FROM docb d JOIN ratio r ON d.bucket = r.bucket
    GROUP BY 1
"""

def _q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment (Broder 1997): short-doc-inside-
    long-doc contamination that symmetric Jaccard scores near zero.
    Staged for r18 (pairs with retirement candidate #3: dedup_lines →
    common_lines + dedup_lines_against, NOTES.md)."""
    from g4s_spark.functions.dedup import containment_pairs

    return containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.4, materialize=True
    )


_SHINGLES = """
    toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
           FROM toks, unnest(generate_series(1, len(t)-2)) AS u(i)
           WHERE len(t) >= 3)
"""

CONTAINMENT_ORACLE = f"""
    WITH {_SHINGLES},
    sz AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dirs AS (
        SELECT a AS contained, b AS container, n * 1.0 / za.c AS c
        FROM inter JOIN sz za ON a = za.doc_id
        UNION ALL
        SELECT b AS contained, a AS container, n * 1.0 / zb.c AS c
        FROM inter JOIN sz zb ON b = zb.doc_id
    )
    SELECT contained, container,
           floor(c * 10000 + 0.5) / 10000 AS containment
    FROM dirs WHERE c >= 0.4
"""


def _q_sample_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k weighted sample (Kool 2019 / A-ES): top-50 docs by
    log(n_chars) − ln(−ln(u)), u the deterministic md5-uniform of
    (doc_id, seed 0) — exact weight-proportional sampling without
    replacement, length-weighted. Staged for r17 (needs a retirement
    slot — candidates in NOTES.md)."""
    from g4s_spark.functions.sampling import gumbel_topk_sample

    docs = load_table(spark, sf_dir, "documents")
    out = gumbel_topk_sample(
        docs.withColumn("lw", F.log(F.col("n_chars").cast("double"))),
        "lw", k=50,
    )
    return out.select(
        "doc_id",
        "source",
        (F.floor(F.col("gumbel_key") * 1000000 + F.lit(0.5)) / 1000000).alias(
            "gumbel_key"
        ),
    )


GUMBEL_ORACLE = """
    SELECT doc_id, source,
           floor(gk * 1000000 + 0.5) / 1000000 AS gumbel_key
    FROM (
        SELECT doc_id, source,
               ln(n_chars)
               - ln(-ln((CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                        / (power(16.0, 8) + 2.0))) AS gk
        FROM documents
    )
    ORDER BY gk DESC, doc_id ASC LIMIT 50
"""

QUEUE_QUERIES = {
    "pipeline_dsir": _q_pipeline_dsir,
    "sample_gumbel_topk": _q_sample_gumbel_topk,
    "dedup_containment": _q_dedup_containment,
}

QUEUE_ORACLES = {
    "pipeline_dsir": DSIR_ORACLE,
    "sample_gumbel_topk": GUMBEL_ORACLE,
    "dedup_containment": CONTAINMENT_ORACLE,
}


def main() -> None:
    sys.path.insert(0, "/root/repo/scripts")
    from check_correctness import run_queue

    run_queue(QUEUE_QUERIES, QUEUE_ORACLES, app_name="r16_queue")


if __name__ == "__main__":
    main()
