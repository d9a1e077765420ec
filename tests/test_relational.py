"""TPC-H operator-matrix shapes (functions/relational.py): structural
invariants at sf0.001. Value-exact verification runs against the DuckDB
oracles (scripts/check_correctness.py / the driver's gate)."""

import pytest
from pyspark.sql import functions as F

from g4s_spark.functions import relational as REL
from g4s_spark.sources import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def t(spark):
    return load_tables(spark, SF)


def test_q2_winners_hit_partition_min(t):
    out = REL.q2_min_cost_supplier(t)
    # every surviving (part, supplier) row carries its part's minimum cost:
    # re-derive the per-part min and compare
    mins = out.groupBy("partkey").agg(F.min("unit_cost").alias("mn"))
    bad = out.join(mins, "partkey").filter(F.col("unit_cost") != F.col("mn"))
    assert bad.count() == 0
    assert out.columns == ["partkey", "ptype", "suppkey", "sname", "nname", "unit_cost"]


def test_q7_both_directions_only(t):
    rows = REL.q7_volume_shipping(t).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(r.revenue > 0 for r in rows)


def test_q8_share_bounded(t):
    rows = REL.q8_market_share(t).collect()
    assert rows, "market-share gate must produce rows"
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_q11_cutoff_filters(t):
    # sf0.001 has no NATION_0 supplier; NATION_3 exists at this scale
    out = REL.q11_important_stock(t, nation_name="NATION_3")
    # every kept part's value exceeds 0.1% of the kept+dropped total
    assert out.count() > 0
    assert out.filter(F.col("val") <= 0).count() == 0


def test_q13_histogram_covers_all_customers(t):
    out = REL.q13_order_distribution(t)
    total = out.agg(F.sum("custdist")).collect()[0][0]
    assert total == t["customer"].count()


def test_q14_ratio_bounded(t):
    [r] = REL.q14_promo_revenue(t).collect()
    assert 0.0 <= r.promo_revenue <= 100.0


def test_q15_all_rows_share_max_revenue(t):
    rows = REL.q15_top_supplier(t).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_q16_excluded_brands_absent(t):
    rows = REL.q16_supplier_count(t).collect()
    assert all(r.p_brand not in ("Brand#1", "Brand#2") for r in rows)
    assert all(r.supplier_cnt >= 1 for r in rows)


def test_q17_scalar_shape(t):
    out = REL.q17_small_quantity(t)
    assert out.columns == ["avg_yearly"]
    assert out.count() == 1


def test_q18_threshold_and_order(t):
    rows = REL.q18_large_orders(t).collect()
    assert all(r.sum_qty > 250 for r in rows)
    prices = [r.totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_q19_single_scalar(t):
    assert REL.q19_disjunctive(t).count() == 1


def test_q20_heavy_suppliers_subset(t):
    out = REL.q20_part_share_suppliers(t)
    sup = {r.s_suppkey for r in t["supplier"].collect()}
    assert {r.suppkey for r in out.collect()} <= sup


def test_q21_single_blame_semantics(t):
    rows = REL.q21_waiting_orders(t).collect()
    assert all(r.numwait >= 1 for r in rows)


def test_q22_idle_have_no_recent_orders(t):
    out = REL.q22_idle_customers(t)
    # aggregate invariant: counts positive, balances positive
    assert out.filter((F.col("numcust") <= 0) | (F.col("totacctbal") <= 0)).count() == 0
