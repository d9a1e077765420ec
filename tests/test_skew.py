"""Skew demonstration: hub-heavy expand joins complete and stay correct
under AQE skew-split and under manual salting (SCALE.md skew strategy)."""

import pytest
from pyspark.sql import functions as F

from g4s_spark.graph.synth import power_law_graph, salt_join_skewed


@pytest.fixture()
def skew_confs(spark):
    """Force sort-merge joins with aggressive skew-split thresholds."""
    saved = {}
    wanted = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    for k, v in wanted.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_power_law_graph_is_skewed_and_deterministic(spark):
    g = power_law_graph(spark, n_nodes=2000, n_edges=50_000, seed=7)
    deg = g.groupBy("dst").count()
    top = deg.orderBy(F.desc("count")).first()
    n_keys = deg.count()
    # the hub owns a large multiple of the mean in-degree
    assert top["count"] > 20 * (50_000 / n_keys)
    assert g.count() == 50_000
    g2 = power_law_graph(spark, n_nodes=2000, n_edges=50_000, seed=7)
    assert g.exceptAll(g2).isEmpty() and g2.exceptAll(g).isEmpty()


def test_expand_skew_split_matches_plain_and_salted(skew_confs):
    spark = skew_confs
    g = power_law_graph(spark, n_nodes=500, n_edges=300_000, alpha=4.0, seed=11).cache()
    try:
        # expand join: hub-skewed edge endpoints against the node table —
        # the shape of a Filter/Expand hop at scale
        e1 = g.select(F.col("src").alias("a"), F.col("dst").alias("k"))
        nodes = spark.range(500).select(
            F.col("id").alias("k2"), (F.col("id") * 2).alias("payload")
        )

        # Collecting THIS DataFrame (not .count(), which builds a separate
        # execution) makes its executedPlan the final adaptive plan.
        cnt = e1.join(nodes, e1["k"] == nodes["k2"]).groupBy().agg(
            F.count(F.lit(1)).alias("n")
        )
        n_skew_split = cnt.collect()[0]["n"]
        plan = cnt._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]

        # same join with skew handling off — identical result
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            n_plain = e1.join(nodes, e1["k"] == nodes["k2"]).count()
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        assert n_plain == n_skew_split

        # manual salting (for consumers that pin partitioning) — identical
        salted = salt_join_skewed(e1, nodes, "k", "k2", n_salts=4)
        assert salted.count() == n_skew_split
        # the hub key's rows really spread over >1 salt value
        hub = g.groupBy("dst").count().orderBy(F.desc("count")).first()["dst"]
        n_hub_salts = (
            e1.where(F.col("k") == hub)
            .select(F.pmod(F.xxhash64("a", "k"), F.lit(4)).alias("s"))
            .distinct()
            .count()
        )
        assert n_hub_salts > 1
    finally:
        g.unpersist()
