"""Round-10 debut-gate staging area.

Every gate here is BUILT AND ORACLE-VERIFIED in round 9 but must not be
registered in __spark_entry__ yet: the contract suite requires a newly
registered gate to debut in the CURRENT driver window, and round 9's 50
slots are full. Round 10 lifts these dicts into _queries_unordered /
oracle_sql verbatim (and into _WINDOW_ORDER after the 26 forced age-4
rotations — see NOTES.md "Concrete r10 window plan"). CAPACITY NOTE:
registry is 175/190 — lifting all 7 lands on 182, so round 10 should
also retire more subsumed gates (RETIRED_GATES.json policy).

Verify locally:  python scripts/r10_queue.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g4s_spark.functions import text as TX
from g4s_spark.functions.rounding import pround
from g4s_spark.graph import build_graph
from g4s_spark.graph.tpch import CUSTOMER_OFF, EDGES_SQL_CTE, LINEITEM_OFF
from g4s_spark.operators import (
    betweenness_centrality,
    harmonic_centrality,
    reciprocity,
)
from g4s_spark.plans import run_cypher, run_cypher_merge
from g4s_spark.sources import load_table

BFS_START = CUSTOMER_OFF + 1
BC_DEPTH = 8
# second Brandes source: another customer seed keeps the oracle's walk
# depth at the customer-graph depth (a supplier seed would add layers)
BC_SRC2 = CUSTOMER_OFF + 2


def _q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (rational idf — bit-exact)."""
    return TX.tfidf_keywords(load_table(spark, sf_dir, "documents"), k=3)


def _q_text_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM rarity signal; integer counts + exact
    rationals only, so no rounding anywhere."""
    return TX.bigram_rarity(
        load_table(spark, sf_dir, "documents"), threshold=2e-4
    )


def _q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the derived part<->supplier digraph (the graph_scc
    fixture): share of edges whose reverse edge exists."""
    li = load_table(spark, sf_dir, "lineitem")
    from g4s_spark.graph.tpch import PART_OFF, SUPPLIER_OFF

    pid = (F.lit(PART_OFF) + F.col("l_partkey")).cast("long")
    sid = (F.lit(SUPPLIER_OFF) + F.col("l_suppkey")).cast("long")
    fwd = li.select(pid.alias("src"), sid.alias("dst"))
    back = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linenumber") == 1)
    ).select(sid.alias("src"), pid.alias("dst"))
    out = reciprocity(fwd.unionByName(back))
    return out.select(
        "n_edges", "n_mutual", pround(F.col("reciprocity"), 9).alias("r")
    )


def _q_graph_harmonic_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted harmonic centrality of the BFS seed: min-plus SSSP
    distances feeding the sum-of-reciprocals aggregate."""
    out = harmonic_centrality(
        build_graph(spark, sf_dir), [BFS_START], weighted=True
    )
    return out.select(
        pround(F.col("harmonic"), 9).alias("harmonic"), "n_reachable"
    )


def _q_graph_betweenness_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED Brandes (|S| = 2): per-source sigma/delta keyed (s, v) in
    one frontier — the scale path betweenness_centrality documents; the
    oracle sums two independent single-source unrolls."""
    bc = betweenness_centrality(
        build_graph(spark, sf_dir), sources=[BFS_START, BC_SRC2]
    )
    return bc.select("id", pround(F.col("bc"), 9).alias("bc"))


def _q_cypher_topk_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by aggregate alias: ORDER BY the count with a deterministic
    binding tie-break, then LIMIT — the grouped-top-k planner path."""
    return run_cypher(
        build_graph(spark, sf_dir),
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "RETURN c, count(o) AS n ORDER BY n DESC, c ASC LIMIT 10",
    )


def _q_cypher_merge_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-form MERGE run twice (idempotent: one Hub node exists), read
    back with its ON CREATE property; ids via next_id like
    cypher_create."""
    g = build_graph(spark, sf_dir)
    stmt = "MERGE (x:Hub {name: 'h1'}) ON CREATE SET x.tier = 9"
    g2 = run_cypher_merge(run_cypher_merge(g, stmt), stmt)
    return run_cypher(
        g2, "MATCH (h:Hub) RETURN h, h.name AS name, h.tier AS tier"
    )


def _q_graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-truss of the co-purchase part graph (every edge closes >= 3
    triangles within the surviving subgraph). Converges in 4 peel
    rounds at sf0.01 (python replica); the oracle unrolls 5 — the peel
    is idempotent at its fixpoint, and an INSUFFICIENT depth cannot
    silently pass (the hash would differ)."""
    from g4s_spark.graph.tpch import PART_OFF  # noqa: F401 (doc parity)
    from g4s_spark.operators import k_truss

    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.alias("l1")
        .join(
            li.alias("l2"),
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(
            F.col("l1.l_partkey").alias("src"),
            F.col("l2.l_partkey").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )
    return k_truss(pairs, k=5)


def _q_ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (round-9, nprobe=2): each query scans its two
    nearest coarse cells; the corpus stays single-assigned."""
    from g4s_spark.functions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, nprobe=2)


def _q_text_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary train + encode roundtrip: top-50 vocab over the corpus,
    every document encoded to ordered vocab ids (OOV -> -1); ids render
    comma-joined (gates cannot emit array columns)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = TX.build_vocab(docs, size=50)
    enc = TX.encode_docs(docs, vocab)
    return enc.select(
        "doc_id",
        F.array_join(F.transform(F.col("ids"), lambda i: i.cast("string")), ",")
        .alias("ids"),
        "n_tokens",
        "n_unk",
    )


def _q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each click event picks the user's latest purchase
    at-or-before it (backward inclusive). The right side pre-aggregates
    to one row per (user, ts) — max(value) — so the match is
    deterministic; the oracle is DuckDB's NATIVE ASOF LEFT JOIN."""
    from g4s_spark.functions.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    out = asof_join(clicks, purchases, on="user_id")
    return out.select("event_id", "user_id", "ts", "ts_r", "pvalue_r")


def _q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: clicks landing inside any same-user error
    window [error_ts, error_ts + 30 min] — the interval-containment
    join, candidates pruned by (user, hour-bucket) equality before the
    exact BETWEEN."""
    from g4s_spark.functions.temporal import range_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    windows = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
    )
    out = range_join(clicks, windows, on="user_id", bucket_s=3600)
    return out.select("click_id", "user_id", "error_id")


QUEUE_QUERIES = {
    "events_asof": _q_events_asof,
    "events_range_join": _q_events_range_join,
    "text_encode": _q_text_encode,
    "ann_ivf_nprobe": _q_ann_ivf_nprobe,
    "graph_ktruss": _q_graph_ktruss,
    "text_tfidf": _q_text_tfidf,
    "text_bigram_rarity": _q_text_bigram_rarity,
    "graph_reciprocity": _q_graph_reciprocity,
    "graph_harmonic_weighted": _q_graph_harmonic_weighted,
    "graph_betweenness_multi": _q_graph_betweenness_multi,
    "cypher_topk_agg": _q_cypher_topk_agg,
    "cypher_merge_node": _q_cypher_merge_node,
}

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _bc_oracle_multi(depth: int, srcs: list[int]) -> str:
    """Sum of independent single-source Brandes unrolls (same recurrence
    as __spark_entry__._bc_oracle, suffixed per source)."""
    edges_cte = EDGES_SQL_CTE.strip().rstrip().replace(
        "AS (", "AS MATERIALIZED (", 1
    )
    ctes = [f"WITH RECURSIVE {edges_cte}"]
    selects = []
    for si, src in enumerate(srcs):
        s = f"s{si}"
        ctes.append(
            f"""walk_{s}(id, d) AS (
                SELECT CAST({src} AS BIGINT), CAST(0 AS BIGINT)
                UNION ALL
                SELECT e.dst, w.d + 1
                FROM walk_{s} w JOIN graph_edges e ON e.src = w.id
                WHERE w.d < {depth}
            )"""
        )
        ctes.append(
            f"dist_{s} AS MATERIALIZED (SELECT id, min(d) AS d "
            f"FROM walk_{s} GROUP BY id)"
        )
        ctes.append(
            f"dag_{s} AS MATERIALIZED ("
            f" SELECT DISTINCT e.src, e.dst, ds.d AS dsrc FROM graph_edges e"
            f" JOIN dist_{s} ds ON ds.id = e.src"
            f" JOIN dist_{s} dd ON dd.id = e.dst AND dd.d = ds.d + 1)"
        )
        ctes.append(
            f"d0_{s} AS (SELECT CAST({src} AS BIGINT) AS id, 1.0 AS sigma)"
        )
        for i in range(1, depth + 1):
            ctes.append(
                f"d{i}_{s} AS MATERIALIZED (SELECT g.dst AS id, "
                f"sum(x.sigma) AS sigma "
                f"FROM d{i-1}_{s} x JOIN dag_{s} g ON g.src = x.id "
                f"AND g.dsrc = {i-1} GROUP BY g.dst)"
            )
        ctes.append(
            f"delta{depth}_{s} AS (SELECT id, 0.0 AS delta FROM d{depth}_{s})"
        )
        for i in range(depth - 1, -1, -1):
            ctes.append(
                f"delta{i}_{s} AS MATERIALIZED ("
                f"SELECT u.id, sum(u.sigma / w.sigma * "
                f"(1.0 + coalesce(dl.delta, 0.0))) AS delta "
                f"FROM d{i}_{s} u JOIN dag_{s} g ON g.src = u.id "
                f"AND g.dsrc = {i} "
                f"JOIN d{i+1}_{s} w ON w.id = g.dst "
                f"LEFT JOIN delta{i+1}_{s} dl ON dl.id = w.id "
                f"GROUP BY u.id)"
            )
        selects += [
            f"SELECT id, delta FROM delta{i}_{s}"
            for i in range(1, depth + 1)
        ]
    alldelta = " UNION ALL ".join(selects)
    return (
        ",\n".join(ctes)
        + "\nSELECT id, floor(sum(delta) * 1000000000 + 0.5) / 1000000000"
        + f" AS bc\nFROM ({alldelta}) GROUP BY id"
    )


def _ktruss_oracle(k: int, rounds: int) -> str:
    """Unrolled k-truss peel: per round, per-edge support = the
    common-neighbor count via two adjacency joins (triangle_count's
    wedge shape), keep support >= k-2. MATERIALIZED so each level
    evaluates once."""
    ctes = [
        """e0 AS MATERIALIZED (
            SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
        )"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""adj{p} AS MATERIALIZED (
                SELECT a AS u, b AS w FROM e{p}
                UNION ALL SELECT b, a FROM e{p}
            )"""
        )
        ctes.append(
            f"""sup{i} AS MATERIALIZED (
                SELECT e.a, e.b, count(*) AS s
                FROM e{p} e
                JOIN adj{p} n1 ON n1.u = e.a
                JOIN adj{p} n2 ON n2.u = e.b AND n2.w = n1.w
                GROUP BY e.a, e.b
            )"""
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
                SELECT s.a, s.b FROM sup{i} s WHERE s.s >= {k - 2}
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a AS src, b AS dst FROM e{rounds}"
    )


def _ann_ivf_nprobe_oracle(nprobe: int = 2, k: int = 5) -> str:
    from g4s_spark.functions import similarity as S

    def cos(a: str, b: str, dim: int = 64) -> str:
        def dot(x: str, y: str) -> str:
            return " + ".join(
                f"CAST({x}[{i}] AS DOUBLE) * CAST({y}[{i}] AS DOUBLE)"
                for i in range(1, dim + 1)
            )
        return f"(({dot(a, b)}) / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"

    probes_sql = S.ivf_assign_sql(nprobe=nprobe)
    return f"""
        WITH cells AS ({S.ivf_assign_sql()}),
        probes AS ({probes_sql}),
        q AS (
            SELECT p.vec_id AS q_id, e.embedding AS qv, p.cell
            FROM probes p JOIN embeddings e USING (vec_id)
            WHERE p.vec_id < 10
        ),
        scored AS (
            SELECT q.q_id, c2.vec_id AS n_id,
                   {cos('q.qv', 'ne.embedding')} AS cos
            FROM q
            JOIN cells c2 ON c2.cell = q.cell
            JOIN embeddings ne ON ne.vec_id = c2.vec_id
            WHERE c2.vec_id != q.q_id
        ),
        ranked AS (
            SELECT q_id, n_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
            FROM scored
        )
        SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank,
               floor(cos * 10000 + 0.5) / 10000 AS cos
        FROM ranked WHERE rank <= {k}
    """


QUEUE_ORACLES = {
    # DuckDB's native ASOF LEFT JOIN is the independent oracle for the
    # union-and-carry-forward Spark formulation
    "events_asof": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, ts, max(value) AS pvalue
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        )
        SELECT c.event_id, c.user_id, c.ts,
               p.ts AS ts_r, p.pvalue AS pvalue_r
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    # plain inequality join: the unbucketed ground truth the bucketed
    # band join must reproduce exactly
    "events_range_join": """
        SELECT c.event_id AS click_id, c.user_id, e.event_id AS error_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
        JOIN (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') e
          ON c.user_id = e.user_id
         AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 30 MINUTE
    """,
    # vocab ids: count desc, token asc, id 0 = most frequent, top 50,
    # min_count 2 (build_vocab defaults); OOV encodes as -1
    "text_encode": f"""
        WITH vocab AS (
            SELECT token, vocab_id FROM (
                SELECT token, count,
                       CAST(row_number() OVER (ORDER BY count DESC, token ASC) - 1
                            AS BIGINT) AS vocab_id
                FROM (
                    SELECT u.token, CAST(count(*) AS BIGINT) AS count
                    FROM (SELECT {_TOKS} AS t FROM documents), unnest(t) AS u(token)
                    GROUP BY 1
                ) c WHERE count >= 2
            ) WHERE vocab_id < 50
        ),
        toks AS (
            SELECT doc_id, t[i] AS token, i AS pos
            FROM (SELECT doc_id, {_TOKS} AS t FROM documents),
                 unnest(generate_series(1, len(t))) AS u(i)
        ),
        enc AS (
            SELECT toks.doc_id, toks.pos,
                   coalesce(v.vocab_id, -1) AS tid
            FROM toks LEFT JOIN vocab v USING (token)
        ),
        agg AS (
            SELECT doc_id,
                   string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
            FROM enc GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.ids, '') AS ids,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_unk, 0) AS n_unk
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "ann_ivf_nprobe": _ann_ivf_nprobe_oracle(),
    "graph_ktruss": _ktruss_oracle(5, 5),
    # rational idf (N+1)/(df+1); rank ties broken by token text. The
    # arithmetic shape (tf * (ratio)) matches tfidf_keywords exactly.
    "text_tfidf": f"""
        WITH toks AS (
            SELECT doc_id, u.token
            FROM (SELECT doc_id, {_TOKS} AS t FROM documents), unnest(t) AS u(token)
        ),
        tf AS (
            SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM toks GROUP BY 1, 2
        ),
        dfreq AS (
            SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token,
                   CAST(tf.tf AS DOUBLE) * ((n.n + 1.0) / (dfreq.df + 1.0)) AS score
            FROM tf JOIN dfreq USING (token), n
        )
        SELECT doc_id, token, rank, score FROM (
            SELECT doc_id, token, score,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, token ASC
                   ) AS BIGINT) AS rank
            FROM scored
        ) WHERE rank <= 3
    """,
    # Laplace-smoothed p(w2|w1) over the corpus's own bigrams; counts
    # and one rational per bigram — bit-exact, no rounding
    "text_bigram_rarity": f"""
        WITH toks AS (
            SELECT doc_id, t[i] AS w1, i AS pos
            FROM (SELECT doc_id, {_TOKS} AS t FROM documents),
                 unnest(generate_series(1, len(t))) AS u(i)
        ),
        bigr AS (
            SELECT doc_id, w1,
                   lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks
        ),
        big AS (SELECT doc_id, w1, w2 FROM bigr WHERE w2 IS NOT NULL),
        c12 AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM big GROUP BY 1, 2
        ),
        c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM big GROUP BY 1),
        v AS (
            SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM (
                SELECT w1 AS t FROM big UNION ALL SELECT w2 FROM big
            )
        ),
        p AS (
            SELECT big.doc_id,
                   (c12.c12 + 1.0) / (c1.c1 + v.v + 0.0) AS p
            FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(CASE WHEN p < 2e-4 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
               CAST(sum(CASE WHEN p < 2e-4 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS rare_ratio,
               min(p) AS min_p
        FROM p GROUP BY doc_id
    """,
    "graph_reciprocity": """
        WITH e AS (
            SELECT DISTINCT CAST(5000000000000 + l_partkey AS BIGINT) AS src,
                   CAST(4000000000000 + l_suppkey AS BIGINT) AS dst
            FROM lineitem
            UNION
            SELECT DISTINCT CAST(4000000000000 + l_suppkey AS BIGINT),
                   CAST(5000000000000 + l_partkey AS BIGINT)
            FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber = 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_mutual,
               floor(CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*) * 1000000000 + 0.5)
                   / 1000000000 AS r
        FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
    """,
    "graph_harmonic_weighted": f"""
        WITH RECURSIVE {EDGES_SQL_CTE.strip().rstrip()},
        walk(id, d) AS (
            SELECT CAST({BFS_START} AS BIGINT), CAST(0 AS BIGINT)
            UNION ALL
            SELECT e.dst, w.d + e.weight
            FROM walk w JOIN graph_edges e ON e.src = w.id
            WHERE w.d < 100
        ),
        dist AS (SELECT id, min(d) AS d FROM walk GROUP BY id)
        SELECT floor(sum(1.0 / d) * 1000000000 + 0.5) / 1000000000 AS harmonic,
               CAST(count(*) AS BIGINT) AS n_reachable
        FROM dist WHERE d > 0
    """,
    "graph_betweenness_multi": None,  # generated below
    "cypher_topk_agg": f"""
        SELECT c, n FROM (
            SELECT CAST({CUSTOMER_OFF} + c_custkey AS BIGINT) AS c,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n
            FROM customer JOIN orders ON o_custkey = c_custkey
            GROUP BY 1
        ) ORDER BY n DESC, c ASC LIMIT 10
    """,
    "cypher_merge_node": f"""
        SELECT CAST({LINEITEM_OFF} AS BIGINT)
               + max(l_orderkey * 8 + l_linenumber) + 1 AS h,
               'h1' AS name, '9' AS tier
        FROM lineitem
    """,
}

QUEUE_ORACLES["graph_betweenness_multi"] = _bc_oracle_multi(
    BC_DEPTH, [BFS_START, BC_SRC2]
)


def main() -> None:
    sys.path.insert(0, "/root/repo/scripts")
    import time

    import check_correctness as cc
    import duckdb

    from g4s_spark.session import get_spark

    spark = get_spark("r10_queue")
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


if __name__ == "__main__":
    main()
