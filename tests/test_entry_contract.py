"""Driver-contract invariants for __spark_entry__ — cheap static checks
(no Spark session) that catch registry drift before the driver does."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_window_order_is_the_first_fifty():
    qs = list(E.queries().keys())
    assert len(E._WINDOW_ORDER) == 50
    assert qs[:50] == E._WINDOW_ORDER


def test_every_query_has_an_oracle_and_vice_versa():
    qs = set(E.queries().keys())
    os_ = set(E.oracle_sql().keys())
    assert qs == os_, (sorted(qs - os_), sorted(os_ - qs))


def test_no_duplicate_registry_keys():
    qs = list(E.queries().keys())
    assert len(qs) == len(set(qs))


def test_oracles_are_nonempty_sql():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_no_gate_returns_array_or_map_columns(spark):
    """The driver's pandas canonicalizer cannot sort/hash list cells
    (CORRECTNESS_r05 cypher_collect red row): every gate must emit only
    scalar columns — list-valued results need a canonical string
    rendering (see _q_cypher_collect). Plan-only: schemas come from
    analysis, nothing executes."""
    from pyspark.sql.types import ArrayType, MapType

    sf_dir = "/root/testdata/sf0.001"
    bad = []
    for name, fn in E.queries().items():
        schema = fn(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, bad
