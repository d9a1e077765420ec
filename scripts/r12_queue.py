"""Round-12 debut-gate staging area.

Every gate here is BUILT AND ORACLE-VERIFIED in round 11 but must not
be registered in __spark_entry__ yet: the contract suite requires a
newly registered gate to debut in the CURRENT driver window, and round
11's 50 slots are full. Round 12 lifts these dicts into
_queries_unordered / oracle_sql verbatim (and into _WINDOW_ORDER
alongside the ~41 forced r8 rotations — see NOTES.md "Concrete r12
window plan"). CAPACITY NOTE: the registry is 188/190 after the r11
lift; lifting all 3 lands on 191 unless r12 also retires >= 1 more
subsumed gate (RETIRED_GATES.json policy) or the 190 trip-wire is
deliberately revisited — NOTES.md carries the retirement shortlist.

The three gates close the last pytest-only kernel surfaces VERDICT r10
#5 named, plus its optional #8:
- grb_select_apply_reduce: GrB select (structural triu + value gt) ->
  apply (unary ainv) -> reduce_rows composed — the unary-op catalog and
  predicate filters finally at the driver.
- grb_assign_extract: extract a re-based submatrix, transform it,
  assign it into a DIFFERENT region, extract a window spanning the
  seam — the full selection algebra (re-base, anti-join out, position
  re-map) in one roundtrip.
- events_range_stream: the range_enrich_stream twin DRAINED AT THE
  DRIVER (availableNow -> parquet sink -> read back), value-hashed
  against the SAME DuckDB oracle as the batch events_range_join —
  stream==batch at the driver, not just in pytest.

Verify locally:  python scripts/r12_queue.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g4s_spark.functions.rounding import pround
from g4s_spark.sources import load_table


def _qty_matrix(spark: SparkSession, sf_dir: str):
    """The mxm gates' order x part quantity matrix (same fixture as
    __spark_entry__._li_matrices' `a`, minus the bench-tuned
    repartition — these gates are filters/projections, not joins)."""
    from g4s_spark.grblas import Matrix

    li = load_table(spark, sf_dir, "lineitem")
    return Matrix.from_df(
        li.groupBy("l_orderkey", "l_partkey").agg(
            F.sum("l_quantity").alias("v")
        ),
        "l_orderkey", "l_partkey", "v",
    )


def _q_grb_select_apply_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GrB select -> apply -> reduce composed: keep the upper triangle
    (orderkey <= partkey) with quantity sums > 25, negate (ainv), then
    row-reduce with plus — all exact integer-valued arithmetic, so the
    oracle is bit-stable."""
    from g4s_spark.grblas import apply, reduce_rows, select

    a = _qty_matrix(spark, sf_dir)
    t = select(select(a, "triu"), "gt", 25.0)
    t = apply(t, "ainv")
    out = reduce_rows(t, "plus")
    return out.df.select("i", pround(F.col("v"), 2).alias("v"))


def _q_grb_assign_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GrB extract/assign roundtrip across the selection algebra:
    sub = -A[1..100, 1..100] (re-based to 0), assigned into rows
    101..200 x cols 1..100 of A (anti-join out the region, re-map the
    sub positions), then extract rows 90..210 (spanning the seam:
    untouched rows 90..100, the assigned block, untouched 201..210),
    re-based again."""
    from g4s_spark.grblas import apply, assign, extract

    a = _qty_matrix(spark, sf_dir)
    sub = apply(extract(a, (1, 100), (1, 100)), "ainv")
    b = assign(a, sub, (101, 200), (1, 100))
    out = extract(b, (90, 210), None)
    return out.df.select("i", "j", pround(F.col("v"), 2).alias("v"))


def _q_events_range_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events_range_join fixture routed through the STREAMING twin:
    clicks arrive as an availableNow file stream, each micro-batch
    range-joins the static same-user error windows, results land in a
    parquet sink and are read back — so the driver value-hashes the
    streaming path against the exact batch oracle."""
    import tempfile

    from g4s_spark.sources.tables import normalize_ts
    from g4s_spark.streaming import range_enrich_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source wants a DIRECTORY; glob-filter it down to
    # the one events file so sibling tables never enter the stream
    ev = normalize_ts(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir),
        ["ts"],
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    windows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
        )
    )
    base = tempfile.mkdtemp(prefix="g4s_range_stream_")
    out_dir = f"{base}/out"

    def sink(df: DataFrame, _batch_id: int) -> None:
        df.select("click_id", "user_id", "error_id").write.mode(
            "append"
        ).parquet(out_dir)

    q = range_enrich_stream(
        clicks, windows, sink, f"{base}/chk", on="user_id", bucket_s=3600
    )
    if not q.awaitTermination(600):
        # a timed-out drain would otherwise fall through to reading a
        # PARTIAL sink (with the query still appending behind the read)
        # and report as a hash mismatch instead of a timeout
        q.stop()
        raise RuntimeError(
            "events_range_stream: availableNow drain did not finish "
            "within 600s; partial sink discarded"
        )
    return spark.read.parquet(out_dir).select("click_id", "user_id", "error_id")


QUEUE_QUERIES = {
    "grb_select_apply_reduce": _q_grb_select_apply_reduce,
    "grb_assign_extract": _q_grb_assign_extract,
    "events_range_stream": _q_events_range_stream,
}

_A_SQL = """
    a AS (
        SELECT l_orderkey AS i, l_partkey AS j, sum(l_quantity) AS v
        FROM lineitem GROUP BY 1, 2
    )
"""

QUEUE_ORACLES = {
    "grb_select_apply_reduce": f"""
        WITH {_A_SQL}
        SELECT i, floor(sum(-v) * 100 + 0.5) / 100 AS v
        FROM a WHERE i <= j AND v > 25 GROUP BY i
    """,
    "grb_assign_extract": f"""
        WITH {_A_SQL},
        sub AS (
            SELECT i - 1 AS i, j - 1 AS j, -v AS v
            FROM a WHERE i BETWEEN 1 AND 100 AND j BETWEEN 1 AND 100
        ),
        b AS (
            SELECT i, j, v FROM a
            WHERE NOT (i BETWEEN 101 AND 200 AND j BETWEEN 1 AND 100)
            UNION ALL
            SELECT i + 101, j + 1, v FROM sub
        )
        SELECT i - 90 AS i, j, floor(v * 100 + 0.5) / 100 AS v
        FROM b WHERE i BETWEEN 90 AND 210
    """,
    # IDENTICAL to the batch events_range_join oracle: the streaming
    # drain must reproduce the batch result bit-for-bit
    "events_range_stream": """
        SELECT c.event_id AS click_id, c.user_id, e.event_id AS error_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
        JOIN (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') e
          ON c.user_id = e.user_id
         AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 30 MINUTE
    """,
}


def main() -> None:
    sys.path.insert(0, "/root/repo/scripts")
    from check_correctness import run_queue

    run_queue(QUEUE_QUERIES, QUEUE_ORACLES, app_name="r12_queue")


if __name__ == "__main__":
    main()
