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


def test_window_ledger_matches_current_window():
    """WINDOW_LEDGER.json records each round's driver window (rounds
    1..N-1 from the CORRECTNESS files, round N = the planned window).
    The newest entry must BE the current _WINDOW_ORDER, so rotating the
    window without updating the ledger fails fast (VERDICT r6 #9)."""
    import json

    ledger = json.load(open("/root/repo/WINDOW_LEDGER.json"))
    newest = ledger[str(max(int(k) for k in ledger))]
    assert sorted(E._WINDOW_ORDER) == newest


def test_no_gate_staler_than_three_rounds():
    """Every registry gate must appear in some driver window at least
    once every 3 rounds (VERDICT r6 #9): a gate absent from the last
    three ledger rounds has an unverified driver row older than the
    staleness budget — rotation cannot silently skip a family again.
    Gates newer than the ledger horizon are exempt only while they are
    IN the current window (a brand-new gate must debut immediately)."""
    import json

    ledger = json.load(open("/root/repo/WINDOW_LEDGER.json"))
    rounds = sorted(int(k) for k in ledger)
    recent = set()
    for r in rounds[-3:]:
        recent |= set(ledger[str(r)])
    ever = set()
    for r in rounds:
        ever |= set(ledger[str(r)])
    stale = []
    for name in E.queries():
        if name in recent:
            continue
        if name not in ever and name in E._WINDOW_ORDER:
            continue  # new gate debuting this round
        stale.append(name)
    assert not stale, f"gates older than 3 windows: {sorted(stale)}"
