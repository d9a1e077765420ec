"""Round-9 debut-gate staging area.

Every gate here is BUILT AND ORACLE-VERIFIED in round 8 but must not be
registered in __spark_entry__ yet: the contract suite requires a newly
registered gate to debut in the CURRENT driver window, and round 8's 50
slots are full (12 session-2 debuts already displaced 12 r5-age gates).
Round 9 lifts these dicts into _queries_unordered / oracle_sql verbatim
(and into _WINDOW_ORDER, after the 18 forced age-4 rotations — see
NOTES.md "Round 8 session-2").

Verify locally:  python scripts/r9_queue.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g4s_spark.functions import dedup as D
from g4s_spark.functions import sampling as SM
from g4s_spark.functions import text as TX
from g4s_spark.functions.rounding import pround
from g4s_spark.functions.rounding import pround as PR
from g4s_spark.graph import build_graph
from g4s_spark.graph.tpch import (
    CUSTOMER_OFF,
    EDGES_SQL_CTE,
    LINEITEM_OFF,
    NATION_OFF,
    PART_OFF,
    SUPPLIER_OFF,
)
from g4s_spark.operators import (
    condensation,
    eigenvector_centrality,
    topological_layers,
)
from g4s_spark.plans import run_cypher, run_cypher_create, run_cypher_set
from g4s_spark.sources import load_table

EIG_ITERS = 3


def _ps_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived part<->supplier graph graph_scc gates on (forward
    edges from every lineitem, reverse edges from returned items)."""
    li = load_table(spark, sf_dir, "lineitem")
    pid = (F.lit(PART_OFF) + F.col("l_partkey")).cast("long")
    sid = (F.lit(SUPPLIER_OFF) + F.col("l_suppkey")).cast("long")
    fwd = li.select(pid.alias("src"), sid.alias("dst"))
    back = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linenumber") == 1)
    ).select(sid.alias("src"), pid.alias("dst"))
    return fwd.unionByName(back)


# SCC + condensed-edge CTE shared by graph_condense / graph_layers —
# identical to the graph_scc oracle's closure construction
_SCC_CTES = f"""
    e AS (
        SELECT DISTINCT CAST({PART_OFF} + l_partkey AS BIGINT) AS src,
               CAST({SUPPLIER_OFF} + l_suppkey AS BIGINT) AS dst
        FROM lineitem
        UNION
        SELECT DISTINCT CAST({SUPPLIER_OFF} + l_suppkey AS BIGINT),
               CAST({PART_OFF} + l_partkey AS BIGINT)
        FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber = 1
    ),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    reach(a, b) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
    ),
    mutual AS (
        SELECT r1.a AS id, r1.b AS m
        FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    ),
    scc AS (
        SELECT n.id, least(n.id, coalesce(min(m.m), n.id)) AS scc
        FROM nodes n LEFT JOIN mutual m ON m.id = n.id
        GROUP BY n.id
    ),
    cond AS (
        SELECT DISTINCT s1.scc AS src, s2.scc AS dst
        FROM e JOIN scc s1 ON s1.id = e.src JOIN scc s2 ON s2.id = e.dst
        WHERE s1.scc <> s2.scc
    )
"""


def _eig_oracle(iters: int) -> str:
    ctes = [
        f"WITH RECURSIVE {EDGES_SQL_CTE.strip().rstrip()}",
        # explicit DISTINCT: under WITH RECURSIVE DuckDB gives the
        # base-UNION-step form special treatment and the dedup is lost
        "graph_nodes AS (SELECT DISTINCT id FROM (SELECT src AS id "
        "FROM graph_edges UNION ALL SELECT dst FROM graph_edges))",
        "x0 AS (SELECT id, 1.0 / (SELECT count(*) FROM graph_nodes) AS ec "
        "FROM graph_nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"m{i} AS (SELECT e.dst AS id, sum(x{i-1}.ec) AS m "
            f"FROM x{i-1} JOIN graph_edges e ON e.src = x{i-1}.id GROUP BY e.dst)"
        )
        ctes.append(
            f"x{i} AS (SELECT g.id, "
            f"coalesce(m.m, 0) / (SELECT sum(m) FROM m{i}) AS ec "
            f"FROM graph_nodes g LEFT JOIN m{i} m ON m.id = g.id)"
        )
    return (
        ",\n".join(ctes)
        + f"\nSELECT id, floor(ec * 1000000000 + 0.5) / 1000000000 AS ec FROM x{iters}"
    )


def _q_graph_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality over exactly the graph the EDGES_SQL_CTE
    oracle walks: node set = edge endpoints (an isolated node would
    score 0 on the Spark side but be absent from the oracle's rows)."""
    from g4s_spark.graph import PropertyGraph

    g = build_graph(spark, sf_dir)
    endpoints = (
        g.edges.select(F.col("src").alias("id"))
        .unionByName(g.edges.select(F.col("dst").alias("id")))
        .dropDuplicates(["id"])
    )
    ec = eigenvector_centrality(
        PropertyGraph(endpoints, g.edges, spark), iters=EIG_ITERS
    )
    return ec.select("id", pround(F.col("ec"), 9).alias("ec"))


def _q_cypher_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE then read back: two literal nodes (ids from next_id — the
    max node id is lineitem's, so the oracle computes the same ids from
    max(l_orderkey*8 + l_linenumber)) and VIP_OF edges created per
    matched pair."""
    g = build_graph(spark, sf_dir)
    g2 = run_cypher_create(
        g, "CREATE (x:Hub {name: 'h1', tier: 1}), (y:Hub {name: 'h2'})"
    )
    g3 = run_cypher_create(
        g2,
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
        "WHERE n.name = 'NATION_1' CREATE (c)-[:VIP_OF]->(n)",
    )
    return run_cypher(
        g3,
        "MATCH (h:Hub) RETURN h, h.name AS name "
        "UNION ALL MATCH (c)-[:VIP_OF]->(n) RETURN c AS h, n.name AS name",
    )


def _q_cypher_set_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET c:VIP for rich customers, read back through the new label.
    Binding-only RETURN: property resolution is per STORE ROW, so a
    two-label node would duplicate a prop-projected row (the documented
    deviation) — the binding projection is distinct."""
    g2 = run_cypher_set(
        build_graph(spark, sf_dir),
        "MATCH (c:Customer) WHERE c.acctbal >= 9000 SET c:VIP",
    )
    return run_cypher(
        g2, "MATCH (v:VIP)-[:FROM_NATION]->(n:Nation) RETURN v, n"
    )


def _q_graph_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source betweenness from the BFS seed (batched Brandes with
    |S| = 1 — the oracle unrolls the layered recurrence)."""
    from g4s_spark.operators import betweenness_centrality

    bc = betweenness_centrality(build_graph(spark, sf_dir), sources=[BC_SRC])
    return bc.select("id", pround(F.col("bc"), 9).alias("bc"))


QUEUE_QUERIES = {
    "graph_eigenvector": _q_graph_eigenvector,
    "graph_betweenness": _q_graph_betweenness,
    "cypher_create": _q_cypher_create,
    "cypher_set_label": _q_cypher_set_label,
    "graph_condense": lambda spark, sf_dir: condensation(
        _ps_edges(spark, sf_dir)
    ),
    "graph_layers": lambda spark, sf_dir: topological_layers(
        condensation(_ps_edges(spark, sf_dir))
    ),
    "sample_split": lambda spark, sf_dir: SM.split_corpus(
        load_table(spark, sf_dir, "documents"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).select("doc_id", "source", "split"),
    "cypher_keys": lambda spark, sf_dir: run_cypher(
        build_graph(spark, sf_dir),
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
        "RETURN c, keys(c) AS kc, properties(n) AS ps",
    ),
    "sample_weighted": lambda spark, sf_dir: SM.weighted_sample(
        load_table(spark, sf_dir, "documents").withColumn(
            "q", F.least(F.col("n_chars") / 2000.0, F.lit(1.0))
        ),
        "q",
    ).select("doc_id", "source"),
    "dedup_kmv": lambda spark, sf_dir: D.kmv_distinct(
        load_table(spark, sf_dir, "documents"), "text", ["source"], k=16
    ).withColumn("estimate", PR(F.col("estimate"), 6)),
    "dedup_lines_index": lambda spark, sf_dir: TX.dedup_lines_against(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") >= 250),
        TX.common_lines(
            load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250),
            sep=" the ", min_docs=2,
        ),
        sep=" the ",
    ),
}

_SPLIT_BUCKET = (
    "CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
)
# thresholds replicate split_corpus's float ACCUMULATION exactly
# (0.1 + 0.8 = 0.9000000000000001 — int() of that is not int(0.9 * SPACE))
_ACC1 = 0.1
_ACC2 = 0.1 + 0.8
_T1 = int(_ACC1 * SM._SAMPLE_SPACE)
_T2 = int(_ACC2 * SM._SAMPLE_SPACE)

QUEUE_ORACLES = {
    "graph_eigenvector": _eig_oracle(EIG_ITERS),
    "graph_betweenness": None,  # generated below (needs BC_DEPTH defined)
    "cypher_create": f"""
        WITH mx AS (
            SELECT CAST({LINEITEM_OFF} AS BIGINT)
                   + max(l_orderkey * 8 + l_linenumber) AS m
            FROM lineitem
        )
        SELECT m + 1 AS h, 'h1' AS name FROM mx
        UNION ALL SELECT m + 2, 'h2' FROM mx
        UNION ALL
        SELECT CAST({CUSTOMER_OFF} + c_custkey AS BIGINT), n_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
    """,
    "cypher_set_label": f"""
        SELECT CAST({CUSTOMER_OFF} + c_custkey AS BIGINT) AS v,
               CAST({NATION_OFF} + c_nationkey AS BIGINT) AS n
        FROM customer WHERE CAST(c_acctbal AS DOUBLE) >= 9000
    """,
    "graph_condense": f"""
        WITH RECURSIVE {_SCC_CTES.strip()}
        SELECT src, dst FROM cond
    """,
    "graph_layers": f"""
        WITH RECURSIVE {_SCC_CTES.strip()},
        cnodes AS (SELECT src AS id FROM cond UNION SELECT dst FROM cond),
        walk(id, d) AS (
            SELECT id, CAST(0 AS BIGINT) FROM cnodes
            WHERE id NOT IN (SELECT dst FROM cond)
            UNION ALL
            SELECT c.dst, w.d + 1 FROM walk w JOIN cond c ON c.src = w.id
        )
        SELECT id, max(d) AS layer FROM walk GROUP BY id
    """,
    # sorted split names (test, train, val) with cumulative thresholds
    # 0.1 / 0.9 — the exact interval arithmetic split_corpus performs
    "sample_split": f"""
        SELECT doc_id, source,
               CASE WHEN {_SPLIT_BUCKET} < {_T1} THEN 'test'
                    WHEN {_SPLIT_BUCKET} < {_T2} THEN 'train'
                    ELSE 'val' END AS split
        FROM documents
    """,
    "sample_weighted": f"""
        SELECT doc_id, source FROM documents
        WHERE CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT)
              < least(n_chars / 2000.0, 1.0) * 4294967296.0
    """,
    "dedup_kmv": f"""
        WITH hashed AS (
            SELECT DISTINCT source,
                   CAST(CAST('0x' || substr(md5('0:' || text), 1, 15) AS BIGINT)
                        AS DOUBLE) / 1152921504606846976.0 AS h
            FROM documents
        ),
        topk AS (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM hashed
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
               floor((CASE WHEN count(*) < 16 THEN CAST(count(*) AS DOUBLE)
                           ELSE 15.0 / max(h) END) * 1000000 + 0.5) / 1000000
                   AS estimate
        FROM topk WHERE rn <= 16 GROUP BY source
    """,
    "cypher_keys": f"""
        SELECT CAST({CUSTOMER_OFF} + c_custkey AS BIGINT) AS c,
               'acctbal,mktsegment,name' AS kc,
               'name=' || n_name AS ps
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    "dedup_lines_index": """
        WITH ls AS (SELECT doc_id, string_split(text, ' the ') AS l FROM documents),
        lines AS (
            SELECT doc_id, i AS pos, l[i] AS line
            FROM ls, unnest(generate_series(1, len(l))) AS u(i)
        ),
        common AS (
            SELECT line FROM lines WHERE doc_id < 250 GROUP BY line
            HAVING count(DISTINCT doc_id) >= 2
        ),
        kept AS (
            SELECT doc_id, pos, line FROM lines
            WHERE doc_id >= 250 AND line NOT IN (SELECT line FROM common)
        )
        SELECT doc_id,
               string_agg(line, ' the ' ORDER BY pos) AS text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    """,
}


def main() -> None:
    sys.path.insert(0, "/root/repo/scripts")
    import check_correctness as cc
    import duckdb
    import time

    from g4s_spark.session import get_spark

    spark = get_spark("r9_queue")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{cc.SF_DIR}/{t}.parquet'")
    failed = 0
    for name, fn in QUEUE_QUERIES.items():
        t0 = time.time()
        sdf = fn(spark, cc.SF_DIR)
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        rel = con.sql(QUEUE_ORACLES[name])
        ocols, orows = rel.columns, rel.fetchall()
        sh, sn = cc.value_hash(scols, srows)
        oh, on = cc.value_hash(ocols, orows)
        ok = sorted(scols) == sorted(ocols) and sn == on and sh == oh
        failed += 0 if ok else 1
        print(f"{'ok  ' if ok else 'FAIL'}  {name}: {sn} vs {on} rows, "
              f"hash {'match' if sh == oh else 'MISMATCH'}  "
              f"({time.time() - t0:.1f}s)")
    print(f"\n{len(QUEUE_QUERIES) - failed} passed, {failed} failed")
    sys.exit(1 if failed else 0)




# --- betweenness oracle: unrolled layered Brandes (single source) ---------

BC_DEPTH = 8  # TPC-H depth from the customer seed is 6; 2 spare layers
# (oracle planning cost grows ~3x per layer — 12 was minutes, 8 is ~5 s;
# an insufficient depth cannot silently pass: the hash gate would differ)
BC_SRC = CUSTOMER_OFF + 1


def _bc_oracle(depth: int) -> str:
    """Single-source Brandes unrolled over a BFS dist table: the
    recursive walk (same shape as the harmonic oracle) assigns layers,
    sigma accumulates forward along dist-increasing edges, and the
    dependency recurrence walks layers deepest-first. Rounded to 9
    like the other double aggregates."""
    edges_cte = EDGES_SQL_CTE.strip().rstrip().replace(
        "AS (", "AS MATERIALIZED (", 1
    )
    ctes = [
        f"WITH RECURSIVE {edges_cte}",
        f"""walk(id, d) AS (
            SELECT CAST({BC_SRC} AS BIGINT), CAST(0 AS BIGINT)
            UNION ALL
            SELECT e.dst, w.d + 1
            FROM walk w JOIN graph_edges e ON e.src = w.id
            WHERE w.d < {depth}
        )""",
        "dist AS MATERIALIZED (SELECT id, min(d) AS d FROM walk GROUP BY id)",
        # DISTINCT: the Spark side walks the deduped (src, dst) edge
        # set (duplicate lineitem rows duplicate edges in the raw CTE)
        "dag AS MATERIALIZED ("
        " SELECT DISTINCT e.src, e.dst, ds.d AS dsrc FROM graph_edges e"
        " JOIN dist ds ON ds.id = e.src JOIN dist dd ON dd.id = e.dst"
        " AND dd.d = ds.d + 1)",
        f"d0 AS (SELECT CAST({BC_SRC} AS BIGINT) AS id, 1.0 AS sigma)",
    ]
    for i in range(1, depth + 1):
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT g.dst AS id, sum(s.sigma) AS sigma "
            f"FROM d{i-1} s JOIN dag g ON g.src = s.id AND g.dsrc = {i-1} "
            f"GROUP BY g.dst)"
        )
    ctes.append(f"delta{depth} AS (SELECT id, 0.0 AS delta FROM d{depth})")
    for i in range(depth - 1, -1, -1):
        ctes.append(
            f"delta{i} AS MATERIALIZED ("
            f"SELECT u.id, sum(u.sigma / w.sigma * (1.0 + coalesce(dl.delta, 0.0))) AS delta "
            f"FROM d{i} u JOIN dag g ON g.src = u.id AND g.dsrc = {i} "
            f"JOIN d{i+1} w ON w.id = g.dst "
            f"LEFT JOIN delta{i+1} dl ON dl.id = w.id "
            f"GROUP BY u.id)"
        )
    alldelta = " UNION ALL ".join(
        f"SELECT id, delta FROM delta{i}" for i in range(1, depth + 1)
    )
    return (
        ",\n".join(ctes)
        + "\nSELECT id, floor(sum(delta) * 1000000000 + 0.5) / 1000000000 AS bc"
        + f"\nFROM ({alldelta}) GROUP BY id"
    )


QUEUE_ORACLES["graph_betweenness"] = _bc_oracle(BC_DEPTH)


if __name__ == "__main__":
    main()
