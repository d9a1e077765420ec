"""Graph persistence layout + GraphDB facade tests."""

from g4s_spark.db import GraphDB
from g4s_spark.graph import PropertyGraph
from g4s_spark.sources import read_graph, write_graph


def diamond(spark):
    return PropertyGraph.from_tuples(
        spark,
        nodes=[(0, "A"), (1, "B"), (2, "B"), (3, "C")],
        edges=[(0, 1, "X"), (1, 3, "Y"), (0, 2, "X"), (2, 3, "Y")],
    )


def test_write_read_roundtrip_partitioned(spark, tmp_path):
    g = diamond(spark)
    write_graph(g, str(tmp_path / "g"))
    g2 = read_graph(spark, str(tmp_path / "g"))
    assert g2.nodes.count() == 4 and g2.edges.count() == 4
    db = GraphDB(g2)
    got = {tuple(r) for r in db.query("MATCH (a:A)-[:X]->(b:B) RETURN b").collect()}
    assert got == {(1,), (2,)}
    # label scan on the partitioned layout is partition-pruned: the plan
    # carries a PartitionFilters entry on label
    plan = g2.label_nodes("A")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "label" in plan


def test_graphdb_explain_and_resolve(spark):
    g = diamond(spark)
    db = GraphDB(g)
    # the diamond's stats prove both hops tautological for RETURN c: the
    # explain trace shows the hop elimination + lone label scan (round-16),
    # and payload resolution works over the reduced plan
    text = db.explain("MATCH (a:A)-[:X]->(b:B)-[:Y]->(c:C) RETURN c")
    assert "edge_elim" in text and "node_scan" in text and "cost" in text
    rows = db.query("MATCH (a:A)-[:X]->(b:B) RETURN b", resolve=True).collect()
    assert {(r.b, r.b_label) for r in rows} == {(1, "B"), (2, "B")}
    # with endpoint stats unknown the full chain plans scan + expand
    g.stats.endpoint_counts.clear()
    text = db.explain("MATCH (a:A)-[:X]->(b:B)-[:Y]->(c:C) RETURN c")
    assert "scan" in text and "expand" in text and "cost" in text


def test_compact_parquet_preserves_rows_and_shrinks_files(spark, tmp_path):
    """Micro-batch ingest leaves one file per batch; compaction must
    reduce the file count without changing the data."""
    import os

    from g4s_spark.sources import compact_parquet

    path = str(tmp_path / "edges")
    for i in range(5):  # five "micro-batches"
        spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "src") \
            .write.mode("append").parquet(path)
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    n_files_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    n = compact_parquet(spark, path, target_files=2)
    assert n == 50
    n_files_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files_after <= 2 < n_files_before
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before


def test_graphdb_explain_lists_planner_steps(spark):
    from g4s_spark.db import GraphDB
    from g4s_spark.graph import PropertyGraph

    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(0, "A"), (1, "B")],
        edges=[(0, 1, "X")],
    )
    txt = GraphDB(g).explain("MATCH (a:A)-[:X]->(b:B) RETURN b")
    assert "scan" in txt


# --- corpus snapshots (round-7) -------------------------------------------


def test_snapshot_write_load_verify_roundtrip(spark, tmp_path):
    from g4s_spark.sources import load_snapshot, read_manifest, snapshot_corpus

    root = str(tmp_path / "corpus")
    df = spark.createDataFrame(
        [(1, "a", "hello world"), (2, "b", "spark tables"), (3, "a", None)],
        "doc_id long, source string, text string",
    )
    m = snapshot_corpus(df, root, "1")
    assert m["n_rows"] == 3 and m["n_ids"] == 3 and m["content_digest"] > 0
    assert read_manifest(root, "1")["version"] == "1"
    back = load_snapshot(spark, root, "1", verify=True)
    assert back.count() == 3
    # immutable: same version refuses
    import pytest as _pytest
    with _pytest.raises(ValueError, match="already exists"):
        snapshot_corpus(df, root, "1")


def test_snapshot_digest_is_order_independent(spark, tmp_path):
    from g4s_spark.sources import snapshot_corpus

    root = str(tmp_path / "corpus_ord")
    rows = [(i, f"t{i}") for i in range(50)]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string").repartition(3)
    ma = snapshot_corpus(a, root, "a")
    mb = snapshot_corpus(b, root, "b")
    assert ma["content_digest"] == mb["content_digest"]
    assert ma["n_rows"] == mb["n_rows"] == 50


def test_snapshot_diff_added_removed_changed(spark, tmp_path):
    from g4s_spark.sources import snapshot_corpus, snapshot_diff

    root = str(tmp_path / "corpus_diff")
    v1 = spark.createDataFrame(
        [(1, "keep"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    v2 = spark.createDataFrame(
        [(1, "keep"), (2, "CHANGED"), (4, "brand new")],
        "doc_id long, text string",
    )
    snapshot_corpus(v1, root, "1")
    snapshot_corpus(v2, root, "2")
    got = {(r.id, r.change) for r in snapshot_diff(spark, root, "1", "2").collect()}
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_snapshot_verify_detects_tamper(spark, tmp_path):
    import glob
    import os

    from g4s_spark.sources import load_snapshot, snapshot_corpus

    root = str(tmp_path / "corpus_tamper")
    df = spark.createDataFrame([(i, "x" * 10) for i in range(20)], "doc_id long, text string")
    snapshot_corpus(df.repartition(4), root, "1")
    # drop one data file: count/digest no longer match the manifest
    victim = sorted(glob.glob(f"{root}/v1/data/part-*"))[0]
    os.remove(victim)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="verification"):
        load_snapshot(spark, root, "1", verify=True).count()


def test_prune_snapshots_retention_and_partials(spark, tmp_path):
    import os
    import time

    from g4s_spark.sources import list_snapshots, prune_snapshots, snapshot_corpus

    root = str(tmp_path / "corpus_gc")
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for v in ("1", "2", "3"):
        m = snapshot_corpus(df, root, v)
        # created_unix has second resolution; force distinct order keys
        mpath = os.path.join(root, f"v{v}", "manifest.json")
        import json as _json
        m["created_unix"] = int(time.time()) + int(v)
        with open(mpath, "w") as f:
            _json.dump(m, f)
    # crashed write, old enough to be past the partial grace window
    part = os.path.join(root, "v9_partial")
    os.makedirs(os.path.join(part, "data"))
    old = time.time() - 3600
    os.utime(part, (old, old))
    removed = prune_snapshots(root, keep_last=2)
    assert sorted(removed) == ["v1", "v9_partial"]
    assert [m["version"] for m in list_snapshots(root)] == ["2", "3"]
    # idempotent
    assert prune_snapshots(root, keep_last=2) == []


def test_prune_spares_in_flight_writes(spark, tmp_path):
    """The GC race fix (VERDICT r7 #2): a manifest-less directory
    younger than the grace window — indistinguishable from a commit in
    progress — survives prune; so does a _tmp.v staging dir (an
    in-flight bulk write). Both are collected once they age out."""
    import os
    import time

    from g4s_spark.sources import prune_snapshots, snapshot_corpus

    root = str(tmp_path / "corpus_inflight")
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    snapshot_corpus(df, root, "1")
    # fresh remnants: a mid-commit v-dir and an in-flight _tmp staging dir
    os.makedirs(os.path.join(root, "v7", "data"))
    os.makedirs(os.path.join(root, "_tmp.v8", "data"))
    assert prune_snapshots(root, keep_last=1) == []
    assert os.path.isdir(os.path.join(root, "v7"))
    assert os.path.isdir(os.path.join(root, "_tmp.v8"))
    # age them past the grace window -> collected
    old = time.time() - 3600
    os.utime(os.path.join(root, "v7"), (old, old))
    os.utime(os.path.join(root, "_tmp.v8"), (old, old))
    assert sorted(prune_snapshots(root, keep_last=1)) == ["_tmp.v8", "v7"]


def test_prune_natural_sorts_same_second_versions(spark, tmp_path):
    """v2 vs v10 committed in the same second: the tiebreak is the
    NATURAL version order, so keep_last=1 keeps v10 (VERDICT r7 #2)."""
    import json as _json
    import os

    from g4s_spark.sources import list_snapshots, prune_snapshots, snapshot_corpus

    root = str(tmp_path / "corpus_natsort")
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    m2 = snapshot_corpus(df, root, "2")
    m10 = snapshot_corpus(df, root, "10")
    # force an exact created_unix tie
    for v, m in (("2", m2), ("10", m10)):
        m["created_unix"] = 1700000000.0
        with open(os.path.join(root, f"v{v}", "manifest.json"), "w") as f:
            _json.dump(m, f)
    assert [m["version"] for m in list_snapshots(root)] == ["2", "10"]
    assert prune_snapshots(root, keep_last=1) == ["v2"]
    assert [m["version"] for m in list_snapshots(root)] == ["10"]


def test_list_snapshots_tolerates_truncated_manifest(spark, tmp_path):
    """A crash mid-manifest can no longer happen (os.replace commit),
    but a truncated manifest on disk must not poison listing/pruning."""
    import os

    from g4s_spark.sources import list_snapshots, snapshot_corpus

    root = str(tmp_path / "corpus_trunc")
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    snapshot_corpus(df, root, "1")
    os.makedirs(os.path.join(root, "v2"))
    with open(os.path.join(root, "v2", "manifest.json"), "w") as f:
        f.write('{"version": "2", "n_rows"')  # truncated
    assert [m["version"] for m in list_snapshots(root)] == ["1"]


def test_resolve_multilabel_single_row(spark):
    """resolve=True (round-9): a multi-label node resolves to ONE row
    whose label column is the sorted comma-joined label set — the same
    shape labels() returns, never a per-label-row fanout."""
    from g4s_spark.db import GraphDB
    from g4s_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(0, "A"), (0, "VIP"), (1, "B")], "id long, label string"
    )
    edges = spark.createDataFrame([(0, 1, "X")], "src long, dst long, type string")
    db = GraphDB(PropertyGraph(nodes, edges, spark))
    rows = db.query("MATCH (a:A)-[:X]->(b:B) RETURN a, b", resolve=True).collect()
    assert len(rows) == 1
    assert rows[0].a_label == "A,VIP"
    assert rows[0].b_label == "B"
