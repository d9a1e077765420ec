"""Graph-ize the TPC-H-ish driver testdata (FIXTURES.md §4).

Node ids are deterministic integer arithmetic over the table keys so the
DuckDB oracle SQL can reproduce them exactly:

    id(Region r)    = 1e12*1 + r_regionkey
    id(Nation n)    = 1e12*2 + n_nationkey
    id(Customer c)  = 1e12*3 + c_custkey
    id(Supplier s)  = 1e12*4 + s_suppkey
    id(Part p)      = 1e12*5 + p_partkey
    id(Order o)     = 1e12*6 + o_orderkey
    id(Lineitem l)  = 1e12*7 + l_orderkey*8 + l_linenumber   (linenumber ≤ 7)

Edge types (direction matches the reference's directed-only model):
    IN_REGION    nation   -> region      weight 4
    FROM_NATION  customer -> nation      weight 3
    FROM_NATION  supplier -> nation      weight 3
    PLACED       customer -> order       weight 1
    HAS_ITEM     order    -> lineitem    weight l_linenumber
    OF_PART      lineitem -> part        weight 1
    BY_SUPP      lineitem -> supplier    weight 2

Integer weights keep min-plus SSSP sums exact (float-order-independent)
for hash comparison against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .store import PropertyGraph

OFF = 1_000_000_000_000
REGION_OFF = OFF * 1
NATION_OFF = OFF * 2
CUSTOMER_OFF = OFF * 3
SUPPLIER_OFF = OFF * 4
PART_OFF = OFF * 5
ORDER_OFF = OFF * 6
LINEITEM_OFF = OFF * 7

# SQL fragments reused by oracle builders (__spark_entry__.py)
SQL_IDS = {
    "Region": f"CAST({REGION_OFF} + r_regionkey AS BIGINT)",
    "Nation": f"CAST({NATION_OFF} + n_nationkey AS BIGINT)",
    "Customer": f"CAST({CUSTOMER_OFF} + c_custkey AS BIGINT)",
    "Supplier": f"CAST({SUPPLIER_OFF} + s_suppkey AS BIGINT)",
    "Part": f"CAST({PART_OFF} + p_partkey AS BIGINT)",
    "Order": f"CAST({ORDER_OFF} + o_orderkey AS BIGINT)",
    "Lineitem": f"CAST({LINEITEM_OFF} + l_orderkey*8 + l_linenumber AS BIGINT)",
}


def _id(col, offset: int):
    return (F.lit(offset) + F.col(col).cast("long")).cast("long")


# One cached graph per (spark app, sf_dir): every query in a session shares
# the materialized nodes/edges instead of re-unioning 7 parquet scans.
_GRAPH_CACHE: dict[tuple[str, str], PropertyGraph] = {}


def build_graph(spark: SparkSession, sf_dir: str, tables: dict[str, DataFrame] | None = None) -> PropertyGraph:
    key = (spark.sparkContext.applicationId, sf_dir)
    if tables is None and key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]
    g = _build_graph_uncached(spark, sf_dir, tables)
    if tables is None:
        g.cache()
        _GRAPH_CACHE[key] = g
    return g


def _build_graph_uncached(spark: SparkSession, sf_dir: str, tables: dict[str, DataFrame] | None = None) -> PropertyGraph:
    if tables is None:
        from ..sources import load_tables

        tables = load_tables(spark, sf_dir)
    region, nation = tables["region"], tables["nation"]
    customer, supplier = tables["customer"], tables["supplier"]
    part, orders, lineitem = tables["part"], tables["orders"], tables["lineitem"]

    li_id = (F.lit(LINEITEM_OFF) + F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")

    def props(**cols):
        """string-keyed property map; doubles round-trip exactly through
        Double.toString so numeric predicates stay exact."""
        pairs = []
        for k, c in cols.items():
            pairs += [F.lit(k), F.col(c).cast("string")]
        return F.create_map(*pairs)

    nodes = (
        region.select(_id("r_regionkey", REGION_OFF).alias("id"), F.lit("Region").alias("label"),
                      props(name="r_name").alias("props"))
        .unionByName(nation.select(_id("n_nationkey", NATION_OFF).alias("id"), F.lit("Nation").alias("label"),
                                   props(name="n_name").alias("props")))
        .unionByName(customer.select(_id("c_custkey", CUSTOMER_OFF).alias("id"), F.lit("Customer").alias("label"),
                                     props(name="c_name", acctbal="c_acctbal", mktsegment="c_mktsegment").alias("props")))
        .unionByName(supplier.select(_id("s_suppkey", SUPPLIER_OFF).alias("id"), F.lit("Supplier").alias("label"),
                                     props(name="s_name", acctbal="s_acctbal").alias("props")))
        .unionByName(part.select(_id("p_partkey", PART_OFF).alias("id"), F.lit("Part").alias("label"),
                                 props(name="p_name", brand="p_brand", type="p_type", size="p_size",
                                       retailprice="p_retailprice").alias("props")))
        .unionByName(orders.select(_id("o_orderkey", ORDER_OFF).alias("id"), F.lit("Order").alias("label"),
                                   props(orderstatus="o_orderstatus", totalprice="o_totalprice",
                                         orderpriority="o_orderpriority").alias("props")))
        .unionByName(lineitem.select(li_id.alias("id"), F.lit("Lineitem").alias("label"),
                                     props(quantity="l_quantity", extendedprice="l_extendedprice",
                                           discount="l_discount", returnflag="l_returnflag").alias("props")))
    )

    def e(df, src, dst, tpe, weight):
        return df.select(
            src.alias("src"), dst.alias("dst"), F.lit(tpe).alias("type"), weight.cast("long").alias("weight")
        )

    edges = (
        e(nation, _id("n_nationkey", NATION_OFF), _id("n_regionkey", REGION_OFF), "IN_REGION", F.lit(4))
        .unionByName(e(customer, _id("c_custkey", CUSTOMER_OFF), _id("c_nationkey", NATION_OFF), "FROM_NATION", F.lit(3)))
        .unionByName(e(supplier, _id("s_suppkey", SUPPLIER_OFF), _id("s_nationkey", NATION_OFF), "FROM_NATION", F.lit(3)))
        .unionByName(e(orders, _id("o_custkey", CUSTOMER_OFF), _id("o_orderkey", ORDER_OFF), "PLACED", F.lit(1)))
        .unionByName(e(lineitem, _id("l_orderkey", ORDER_OFF), li_id, "HAS_ITEM", F.col("l_linenumber")))
        .unionByName(e(lineitem, li_id, _id("l_partkey", PART_OFF), "OF_PART", F.lit(1)))
        .unionByName(e(lineitem, li_id, _id("l_suppkey", SUPPLIER_OFF), "BY_SUPP", F.lit(2)))
    )
    g = PropertyGraph(nodes, edges, spark)

    # label/type counts are table counts — parquet row-group metadata makes
    # .count() on a bare scan cheap, so the planner's stats never require a
    # full scan of the unioned nodes/edges (StatsStore analogue, free).
    from .stats import GraphStats

    counts = {name: tables[name].count() for name in
              ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]}
    label_counts = {
        "Region": counts["region"], "Nation": counts["nation"],
        "Customer": counts["customer"], "Supplier": counts["supplier"],
        "Part": counts["part"], "Order": counts["orders"], "Lineitem": counts["lineitem"],
    }
    type_counts = {
        "IN_REGION": counts["nation"],
        "FROM_NATION": counts["customer"] + counts["supplier"],
        "PLACED": counts["orders"],
        "HAS_ITEM": counts["lineitem"],
        "OF_PART": counts["lineitem"],
        "BY_SUPP": counts["lineitem"],
    }
    # (srcLabel, type, dstLabel) triplet counters (StatsStore.scala:
    # 141-170) — static from the schema, so FROM_NATION's two label pairs
    # estimate exactly instead of via independent selectivities
    triplet_counts = {
        ("Nation", "IN_REGION", "Region"): counts["nation"],
        ("Customer", "FROM_NATION", "Nation"): counts["customer"],
        ("Supplier", "FROM_NATION", "Nation"): counts["supplier"],
        ("Customer", "PLACED", "Order"): counts["orders"],
        ("Order", "HAS_ITEM", "Lineitem"): counts["lineitem"],
        ("Lineitem", "OF_PART", "Part"): counts["lineitem"],
        ("Lineitem", "BY_SUPP", "Supplier"): counts["lineitem"],
    }
    # distinct endpoint counts per (type, side) — the tautological-hop
    # elimination's participation test (planner._eliminate_tautological
    # _edges). Side counts that are one-edge-per-row with a unique key
    # are the table counts (static); the referenced-key sides are exact
    # distinct counts over the key column, computed once per session
    # (the graph is cached by build_graph) — small column scans.
    dc = lambda df, col: df.select(col).distinct().count()  # noqa: E731
    endpoint_counts = {
        ("IN_REGION", 0): counts["nation"],
        ("IN_REGION", 2): dc(nation, "n_regionkey"),
        ("FROM_NATION", 0): counts["customer"] + counts["supplier"],
        ("FROM_NATION", 2): (
            customer.select(F.col("c_nationkey").alias("k"))
            .unionByName(supplier.select(F.col("s_nationkey").alias("k")))
            .distinct()
            .count()
        ),
        ("PLACED", 0): dc(orders, "o_custkey"),
        ("PLACED", 2): counts["orders"],
        ("HAS_ITEM", 0): dc(lineitem, "l_orderkey"),
        ("HAS_ITEM", 2): counts["lineitem"],
        ("OF_PART", 0): counts["lineitem"],
        ("OF_PART", 2): dc(lineitem, "l_partkey"),
        ("BY_SUPP", 0): counts["lineitem"],
        ("BY_SUPP", 2): dc(lineitem, "l_suppkey"),
    }
    g._stats = GraphStats(
        sum(label_counts.values()), sum(type_counts.values()), label_counts, type_counts,
        triplet_counts,
        endpoint_counts,
        # ids are disjoint by table offset and each table contributes one
        # label row per key, so the single-label invariant holds statically
        single_label=True,
    )
    return g


NODES_SQL_CTE = f"""
    graph_nodes(id) AS (
        SELECT CAST({REGION_OFF} + r_regionkey AS BIGINT) FROM region
        UNION ALL SELECT CAST({NATION_OFF} + n_nationkey AS BIGINT) FROM nation
        UNION ALL SELECT CAST({CUSTOMER_OFF} + c_custkey AS BIGINT) FROM customer
        UNION ALL SELECT CAST({SUPPLIER_OFF} + s_suppkey AS BIGINT) FROM supplier
        UNION ALL SELECT CAST({PART_OFF} + p_partkey AS BIGINT) FROM part
        UNION ALL SELECT CAST({ORDER_OFF} + o_orderkey AS BIGINT) FROM orders
        UNION ALL SELECT CAST({LINEITEM_OFF} + l_orderkey*8 + l_linenumber AS BIGINT) FROM lineitem
    )
"""

# Oracle-side: the same edge list as a DuckDB CTE, for recursive BFS/SSSP
# oracles. Matches build_graph exactly.
EDGES_SQL_CTE = f"""
    graph_edges(src, dst, type, weight) AS (
        SELECT {SQL_IDS['Nation'].replace('n_nationkey', 'n_nationkey')},
               CAST({REGION_OFF} + n_regionkey AS BIGINT), 'IN_REGION', CAST(4 AS BIGINT) FROM nation
        UNION ALL
        SELECT {SQL_IDS['Customer']}, CAST({NATION_OFF} + c_nationkey AS BIGINT), 'FROM_NATION', 3 FROM customer
        UNION ALL
        SELECT {SQL_IDS['Supplier']}, CAST({NATION_OFF} + s_nationkey AS BIGINT), 'FROM_NATION', 3 FROM supplier
        UNION ALL
        SELECT CAST({CUSTOMER_OFF} + o_custkey AS BIGINT), {SQL_IDS['Order']}, 'PLACED', 1 FROM orders
        UNION ALL
        SELECT CAST({ORDER_OFF} + l_orderkey AS BIGINT), {SQL_IDS['Lineitem']}, 'HAS_ITEM', CAST(l_linenumber AS BIGINT) FROM lineitem
        UNION ALL
        SELECT {SQL_IDS['Lineitem']}, CAST({PART_OFF} + l_partkey AS BIGINT), 'OF_PART', 1 FROM lineitem
        UNION ALL
        SELECT {SQL_IDS['Lineitem']}, CAST({SUPPLIER_OFF} + l_suppkey AS BIGINT), 'BY_SUPP', 2 FROM lineitem
    )
"""
