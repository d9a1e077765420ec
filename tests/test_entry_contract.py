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
