"""BFS / SSSP golden tests on the DocSpec 7-node fixtures (FIXTURES.md §2.3,
reference DocSpec.scala:31-101)."""

import pytest

from g4s_spark.graph import PropertyGraph
from g4s_spark.operators import bfs, reachable, sssp

UNWEIGHTED = [(0, 2), (0, 3), (1, 4), (1, 6), (2, 5), (3, 0), (3, 2), (4, 5), (5, 2), (6, 2), (6, 3), (6, 4)]
# DocSpec.scala:55-101 weighted digraph; golden SSSP from 0:
# [0.0, 0.3, 1.0, 0.8, 0.4, 0.5, 1.0]
WEIGHTED = [
    (0, 1, 0.3), (0, 3, 0.8), (1, 4, 0.1), (1, 6, 0.7), (2, 5, 0.5),
    (3, 0, 0.2), (3, 2, 0.4), (4, 5, 0.1), (5, 2, 0.5), (6, 2, 0.1),
    (6, 3, 0.5), (6, 4, 0.9),
]


@pytest.fixture(scope="module")
def unweighted(spark):
    nodes = [(i, "V") for i in range(7)]
    edges = [(s, d, "E") for s, d in UNWEIGHTED]
    return PropertyGraph.from_tuples(spark, nodes, edges).cache()


@pytest.fixture(scope="module")
def weighted(spark):
    nodes = [(i, "V") for i in range(7)]
    edges = [(s, d, "E", w) for s, d, w in WEIGHTED]
    return PropertyGraph.from_tuples(spark, nodes, edges).cache()


def test_bfs_one_hop_golden(unweighted):
    got = {r.id for r in bfs(unweighted, [0], max_hops=1).filter("dist = 1").collect()}
    assert got == {2, 3}  # DocSpec.scala:31-53


def test_bfs_full_distances(unweighted):
    got = {r.id: r.dist for r in bfs(unweighted, [0]).collect()}
    assert got == {0: 0, 2: 1, 3: 1, 5: 2}  # 5 via 2; 1,4,6 unreachable


def test_bfs_cycle_terminates(unweighted):
    # 0 -> 3 -> 0 cycle must not loop forever
    got = reachable(unweighted, [3]).count()
    assert got == 4  # {3, 0, 2, 5}


def test_sssp_docspec_golden(spark, weighted):
    got = {r.id: pytest.approx(r.dist, abs=1e-9) for r in sssp(weighted, [0]).collect()}
    assert got == {0: 0.0, 1: 0.3, 2: 1.0, 3: 0.8, 4: 0.4, 5: 0.5, 6: 1.0}


def test_pagerank_star(spark):
    """Star graph: all leaves point at the hub; after 1 iteration the hub
    holds (1-d)/N + d·(3/4)·(1/N)·... — check against hand-computed."""
    from g4s_spark.operators import pagerank

    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(0, "V"), (1, "V"), (2, "V"), (3, "V")],
        edges=[(1, 0, "E"), (2, 0, "E"), (3, 0, "E")],
    )
    pr = {r.id: r.pr for r in pagerank(g, iters=1).collect()}
    n, d = 4, 0.85
    assert pr[0] == pytest.approx((1 - d) / n + d * 3 * (1 / n), abs=1e-12)
    assert pr[1] == pytest.approx((1 - d) / n, abs=1e-12)  # no in-edges
    assert sum(pr.values()) <= 1.0 + 1e-9


def test_pagerank_iteration_agg_reuses_mass_cache_partitioning(spark):
    """The cached _mass_edges table is hash-partitioned on dst
    (round-16), and that partitioning must survive the broadcast rank
    join + dst->id projection into the per-iteration mass aggregation:
    the iteration plan may contain NO shuffle exchange (only the rank
    broadcast). This is the plan shape that makes each pagerank
    iteration a single cache-scan job."""
    from pyspark.sql import functions as F

    from g4s_spark.operators.algorithms import _mass_edges

    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(i, "V") for i in range(6)],
        edges=[(i, (i + 1) % 6, "E") for i in range(6)] + [(0, 3, "E")],
    )
    e3 = _mass_edges(g)
    e3.count()  # materialize the cache (bench warmup does the same)
    pr = spark.createDataFrame([(0, 0.5), (3, 0.25)], "id long, pr double")
    it = (
        e3.join(F.broadcast(pr), pr.id == e3.src, "left")
        .select(
            F.col("dst").alias("id"),
            (F.col("cnt") * (F.coalesce(F.col("pr"), F.lit(0.1)) / F.col("deg"))).alias("c"),
        )
        .groupBy("id")
        .agg(F.sum("c").alias("mass"))
    )
    plan = it._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryRelation" in plan, plan
    # only the plan ABOVE the cache scan matters: the cached build
    # lineage legitimately contains the one-time REPARTITION_BY_COL
    # exchange that established the dst partitioning
    above_cache = plan.split("InMemoryRelation", 1)[0]
    assert "Exchange hashpartitioning" not in above_cache, above_cache
    assert "InMemoryTableScan" in above_cache, above_cache
    # and the masses are right: node 1 gets 0.5/2 (node 0 has outdeg 2)
    masses = {r.id: r.mass for r in it.collect()}
    assert masses[1] == pytest.approx(0.25)


def test_connected_components_two_islands(spark):
    from g4s_spark.operators import connected_components

    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(0, "V"), (1, "V"), (2, "V"), (5, "V"), (6, "V"), (9, "V")],
        edges=[(0, 1, "E"), (2, 1, "E"), (5, 6, "E")],
    )
    comp = {r.id: r.component for r in connected_components(g).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 9: 9}


def test_triangle_count_known(spark):
    from pyspark.sql import functions as F

    from g4s_spark.operators import triangle_count

    # K4 minus one edge: triangles {0,1,2} and {0,1,3}
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)], "a long, b long"
    )
    assert triangle_count(pairs).collect()[0].n_triangles == 2


def test_sssp_integer_weights(spark):
    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(0, "V"), (1, "V"), (2, "V")],
        edges=[(0, 1, "E", 3.0), (0, 2, "E", 10.0), (1, 2, "E", 2.0)],
    )
    got = {r.id: r.dist for r in sssp(g, [0]).collect()}
    assert got == {0: 0, 1: 3, 2: 5}  # min-plus picks the 2-hop path


def test_reliable_checkpoint_mode(unweighted, weighted, tmp_path, monkeypatch):
    """G4S_CHECKPOINT_DIR switches every iterative loop from
    localCheckpoint to reliable checkpoint() (lost-executor safety on a
    cluster); results must be identical in both modes and checkpoint
    files must actually land in the directory."""
    import os

    from g4s_spark.operators import connected_components, pagerank

    base_bfs = {(r.id, r.dist) for r in bfs(unweighted, [0]).collect()}
    base_sssp = {(r.id, round(r.dist, 6)) for r in sssp(weighted, [0]).collect()}
    base_cc = {(r.id, r.component) for r in connected_components(unweighted).collect()}
    base_pr = {(r.id, round(r.pr, 9)) for r in pagerank(unweighted).collect()}

    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("G4S_CHECKPOINT_DIR", ckdir)
    assert {(r.id, r.dist) for r in bfs(unweighted, [0]).collect()} == base_bfs
    assert {(r.id, round(r.dist, 6)) for r in sssp(weighted, [0]).collect()} == base_sssp
    assert {(r.id, r.component) for r in connected_components(unweighted).collect()} == base_cc
    assert {(r.id, round(r.pr, 9)) for r in pagerank(unweighted).collect()} == base_pr
    # reliable checkpoints were written under the configured dir
    found = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert found, "no checkpoint files written in reliable mode"


def test_personalized_pagerank_mass_at_seeds(spark):
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.operators import pagerank, personalized_pagerank

    # star: 0 -> 1..4; seed at the center only
    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(i, "N") for i in range(5)],
        edges=[(0, i, "E") for i in range(1, 5)],
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    pr = {r.id: r.pr for r in personalized_pagerank(g, seeds, iters=3).collect()}
    # reset mass only returns to the seed; leaves receive only walk mass
    assert pr[0] == pytest.approx(0.15, abs=1e-9)
    for leaf in range(1, 5):
        assert pr[leaf] == pytest.approx(0.85 * 0.15 / 4, abs=1e-9)
    # uniform seeds == plain pagerank
    all_seeds = g.nodes.select("id")
    ppr_all = {r.id: r.pr for r in personalized_pagerank(g, all_seeds, iters=3).collect()}
    plain = {r.id: r.pr for r in pagerank(g, iters=3).collect()}
    for k in plain:
        assert ppr_all[k] == pytest.approx(plain[k], abs=1e-12)
    with pytest.raises(ValueError, match="non-empty seed"):
        personalized_pagerank(g, spark.createDataFrame([], "id long"), iters=1).collect()


def test_k_core_peels_pendant_chain(spark):
    """K4 with a pendant chain: the 2-core is exactly the K4 (the chain
    peels away over two iterations), each member with core degree 3."""
    from g4s_spark.operators import k_core

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 4), (4, 5)]
    pairs = spark.createDataFrame(k4 + chain, "a long, b long")
    got = sorted(tuple(r) for r in k_core(pairs, 2).collect())
    assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_k_core_empty_when_k_too_high(spark):
    from g4s_spark.operators import k_core

    pairs = spark.createDataFrame([(0, 1), (1, 2)], "a long, b long")
    assert k_core(pairs, 5).count() == 0


def test_weighted_pagerank_follows_weights(spark):
    """Star with unequal weights: the heavier target accumulates more
    rank; equal weights reduce to plain pagerank."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.operators import pagerank, weighted_pagerank

    nodes = spark.createDataFrame(
        [(0, "N"), (1, "N"), (2, "N")], "id long, label string"
    )
    edges = spark.createDataFrame(
        [(0, 1, "X", 3), (0, 2, "X", 1)], "src long, dst long, type string, weight long"
    )
    pr = {r.id: r.pr for r in weighted_pagerank(PropertyGraph(nodes, edges), iters=2).collect()}
    assert pr[1] > pr[2] > 0

    eq_edges = spark.createDataFrame(
        [(0, 1, "X", 1), (0, 2, "X", 1)], "src long, dst long, type string, weight long"
    )
    g2 = PropertyGraph(nodes, eq_edges)
    wpr = {r.id: round(r.pr, 12) for r in weighted_pagerank(g2, iters=2).collect()}
    ppr = {r.id: round(r.pr, 12) for r in pagerank(g2, iters=2).collect()}
    assert wpr == ppr


def test_weighted_pagerank_memo_keyed_by_weight_col(spark):
    """Two calls on ONE graph with opposite weight columns must not share
    the cached weight fold (ADVICE r5: the memo ignored weight_col and
    silently reused the first column's table)."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.operators import weighted_pagerank

    nodes = spark.createDataFrame(
        [(0, "N"), (1, "N"), (2, "N")], "id long, label string"
    )
    edges = spark.createDataFrame(
        [(0, 1, "X", 3, 1), (0, 2, "X", 1, 3)],
        "src long, dst long, type string, wa long, wb long",
    )
    g = PropertyGraph(nodes, edges)
    pra = {r.id: r.pr for r in weighted_pagerank(g, iters=2, weight_col="wa").collect()}
    prb = {r.id: r.pr for r in weighted_pagerank(g, iters=2, weight_col="wb").collect()}
    assert pra[1] > pra[2], "wa favors node 1"
    assert prb[2] > prb[1], "wb favors node 2 (stale cache would repeat wa)"
    # symmetric weights -> symmetric ranks
    assert abs(pra[1] - prb[2]) < 1e-12 and abs(pra[2] - prb[1]) < 1e-12


def test_neighborhood_jaccard_square_plus_diagonal(spark):
    """Square 0-1-2-3-0: opposite corners share both neighbors
    (jaccard 1.0); adjacent corners share none."""
    from g4s_spark.operators import neighborhood_jaccard

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "a long, b long"
    )
    got = {(r.x, r.y): (r.shared, round(r.jaccard, 6))
           for r in neighborhood_jaccard(pairs, threshold=0.0).collect()}
    assert got == {(0, 2): (2, 1.0), (1, 3): (2, 1.0)}


def test_hub_degree_guard_trips_and_passes(spark):
    """max_neighbor_degree (VERDICT r14 #2): a hub neighbor above the
    cap fails the job LOUDLY (executor-side raise_error naming the
    hub) instead of silently planning deg² candidate pairs; under the
    cap the guard is result-invisible — same rows with the guard on,
    off (None), and at the exact degree.

    Retried once on failure (conftest.retry_once_on_contention): the
    raise_error-propagation assert is the one test a concurrently
    running Spark application can flip red (VERDICT r15 #8)."""
    from conftest import retry_once_on_contention

    retry_once_on_contention(_hub_degree_guard_body)(spark)


def _hub_degree_guard_body(spark):
    import pytest as pt
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from g4s_spark.operators import common_neighbor_scores, neighborhood_jaccard

    # star: node 9 is a hub of degree 4; leaves pairwise share only it
    star = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (4, 9)], "a long, b long"
    )
    for fn, kw in (
        (neighborhood_jaccard, {"threshold": 0.0}),
        (common_neighbor_scores, {}),
    ):
        with pt.raises(SparkRuntimeException, match="max_neighbor_degree=3"):
            fn(star, max_neighbor_degree=3, **kw).collect()
        baseline = sorted(map(tuple, fn(star, max_neighbor_degree=None, **kw).collect()))
        for cap in (4, 65536):
            got = sorted(map(tuple, fn(star, max_neighbor_degree=cap, **kw).collect()))
            assert got == baseline, (fn.__name__, cap)
        assert len(baseline) == 6  # C(4,2) leaf pairs through the hub


def test_label_propagation_two_communities(spark):
    """Two triangles bridged by one edge: deterministic synchronous LPA
    (min-label tie-break) labels each triangle with its smallest id."""
    from g4s_spark.operators import label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)], "a long, b long"
    )
    got = {r.id: r.lbl for r in label_propagation(pairs, iters=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_deterministic_across_runs(spark):
    from g4s_spark.operators import label_propagation

    pairs = spark.createDataFrame(
        [(i, j) for i in range(8) for j in range(i + 1, 8) if (i + j) % 3],
        "a long, b long",
    )
    a = sorted(tuple(r) for r in label_propagation(pairs, iters=2).collect())
    b = sorted(tuple(r) for r in label_propagation(pairs, iters=2).collect())
    assert a == b


def test_hits_hubs_and_authorities(spark):
    """0,1 point at 2,3 (0 at both, 2 from both): 0 is the top hub, 2
    the top authority; pure hubs have auth 0 and vice versa; scores are
    L2-normalized."""
    from g4s_spark.operators import hits

    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(i, "V") for i in range(4)],
        edges=[(0, 2, "E"), (0, 3, "E"), (1, 2, "E")],
    )
    got = {r.id: (r.hub, r.auth) for r in hits(g, iters=3).collect()}
    assert got[0][0] > got[1][0] > 0 and got[0][1] == 0.0
    assert got[2][1] > got[3][1] > 0 and got[2][0] == 0.0
    hub_norm = sum(h * h for h, _ in got.values()) ** 0.5
    auth_norm = sum(a * a for _, a in got.values()) ** 0.5
    assert abs(hub_norm - 1.0) < 1e-9 and abs(auth_norm - 1.0) < 1e-9


def test_hits_checkpoints_half_step_aggregates(spark, monkeypatch):
    """The half-step aggregates are consumed twice (norm collect + join);
    hits must materialize each ONE time via iter_checkpoint so the
    join does not recompute the aggregation lineage (VERDICT r6 #2)."""
    from g4s_spark.operators import algorithms as alg

    calls = {"n": 0}
    real = alg.iter_checkpoint

    def counting(df, *a, **kw):
        calls["n"] += 1
        return real(df, *a, **kw)

    monkeypatch.setattr(alg, "iter_checkpoint", counting)
    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(i, "V") for i in range(4)],
        edges=[(0, 2, "E"), (0, 3, "E"), (1, 2, "E")],
    )
    got = {r.id: (r.hub, r.auth) for r in alg.hits(g, iters=2).collect()}
    # two checkpoints per iteration (one per half-step), minimum
    assert calls["n"] >= 4
    assert got[0][0] > got[1][0] > 0 and got[0][1] == 0.0


def test_clustering_coefficient(spark):
    """Triangle 0-1-2 plus pendant 3 off node 2: triangle corners have
    cc by formula, the pendant and degree-1 nodes get 0."""
    from g4s_spark.operators import clustering_coefficient

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], "a long, b long"
    )
    got = {r.id: (r.deg, r.n_tri, r.cc) for r in clustering_coefficient(pairs).collect()}
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, 2 / 6)  # 2*1 / (3*2)
    assert got[3] == (1, 0, 0.0)


def test_degree_assortativity(spark):
    """Star graph (hub-leaf): perfectly disassortative, r = -1; the
    closed form comes from exact integer sums."""
    from g4s_spark.operators import degree_assortativity

    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "a long, b long")
    row = degree_assortativity(star).collect()[0]
    assert row.n_ends == 8
    assert abs(row.r - (-1.0)) < 1e-12
    # degenerate: all degrees equal (single edge) -> NULL r
    one = spark.createDataFrame([(0, 1)], "a long, b long")
    assert degree_assortativity(one).collect()[0].r is None


def test_label_assortativity_strata_and_duplicates(spark):
    """By-label Newman r (round-8): hand-computed stratum r, degenerate
    stratum NULL, and duplicate (id,label) node rows must not fan the
    edge join out (the testdata carries duplicate lineitem ids)."""
    from g4s_spark.operators import label_assortativity

    nodes = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (3, "B"), (4, "B"), (5, "B")],
        "id long, label string",
    )
    edges = spark.createDataFrame(
        [(1, 3), (1, 4), (2, 3), (3, 5)], "src long, dst long"
    )
    out = {
        (r.src_label, r.dst_label): (r.n_edges, r.r)
        for r in label_assortativity(edges, nodes).collect()
    }
    # degrees: 1:2, 2:1, 3:3, 4:1, 5:1
    # A->B ends x=[2,2,1], y=[3,1,3] -> r = -2/(sqrt(2)*sqrt(8)) = -0.5
    n, r = out[("A", "B")]
    assert n == 3 and r == pytest.approx(-0.5)
    # single-edge stratum: zero variance -> NULL
    n, r = out[("B", "B")]
    assert n == 1 and r is None


def test_closeness_centrality(spark):
    """Chain 0->1->2->3: dists 1,2,3 from node 0 -> closeness
    = 3/6 = 0.5; isolated seed -> NULL closeness, 0 reachable."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.operators import closeness_centrality

    g = PropertyGraph.from_tuples(
        spark,
        [(0, "N"), (1, "N"), (2, "N"), (3, "N"), (9, "N")],
        [(0, 1, "E"), (1, 2, "E"), (2, 3, "E")],
    )
    row = closeness_centrality(g, [0]).collect()[0]
    assert row.closeness == pytest.approx(0.5) and row.n_reachable == 3
    row = closeness_centrality(g, [9]).collect()[0]
    assert row.closeness is None and row.n_reachable == 0


def test_strongly_connected_components(spark):
    """SCC (round-8): coloring + backward confinement. Covers a 3-cycle
    feeding a 2-cycle (two peel rounds through the condensation DAG),
    path singletons, a self-loop, and an all-singleton DAG."""
    from g4s_spark.operators import strongly_connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6), (6, 7), (7, 7)],
        "src long, dst long",
    )
    got = sorted(
        (r.id, r.scc) for r in strongly_connected_components(edges).collect()
    )
    assert got == [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6), (7, 7)]
    # DAG: every node its own component
    dag = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    got = sorted(
        (r.id, r.scc) for r in strongly_connected_components(dag).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]
    # two disjoint cycles peel in ONE round (each color class has a root)
    two = spark.createDataFrame(
        [(10, 11), (11, 10), (20, 21), (21, 20)], "src long, dst long"
    )
    got = sorted(
        (r.id, r.scc) for r in strongly_connected_components(two).collect()
    )
    assert got == [(10, 10), (11, 10), (20, 20), (21, 20)]


def test_scc_peels_on_final_allowed_round(spark):
    """A condensation depth EQUAL to max_iters must succeed (round-9,
    ADVICE r8 off-by-one): the 3-chain peels one singleton per round,
    finishing exactly on round 3; one round short still raises."""
    from g4s_spark.operators import strongly_connected_components

    chain = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = sorted(
        (r.id, r.scc)
        for r in strongly_connected_components(chain, max_iters=3).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]
    with pytest.raises(RuntimeError, match="peel"):
        strongly_connected_components(chain, max_iters=2)


def test_eigenvector_centrality(spark):
    """Power iteration on the in-edge sum, L1-normalized per step —
    checked against a numpy replica on a small cyclic graph."""
    import numpy as np

    from pyspark.sql import functions as F

    from g4s_spark.graph import PropertyGraph
    from g4s_spark.operators import eigenvector_centrality

    edge_list = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 1)]
    nodes = spark.createDataFrame([(i, "N") for i in range(4)], "id long, label string")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    g = PropertyGraph(nodes, edges.withColumn("type", F.lit("E")), spark)
    got = {r.id: r.ec for r in eigenvector_centrality(g, iters=8).collect()}

    x = np.full(4, 0.25)
    A = np.zeros((4, 4))
    for s, d in edge_list:
        A[s, d] = 1.0
    for _ in range(8):
        x = A.T @ x
        x = x / x.sum()
    for i in range(4):
        assert got[i] == pytest.approx(x[i], rel=1e-9), i
    # node 3 has no in-links: decays to 0
    assert got[3] == 0.0
    # a pure DAG: all mass dies, early-stop returns zeros
    dag = PropertyGraph(
        nodes, spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long").withColumn("type", F.lit("E")), spark
    )
    got = {r.id: r.ec for r in eigenvector_centrality(dag, iters=8).collect()}
    assert set(got.values()) == {0.0}


def test_condensation(spark):
    """SCC-contracted quotient graph is a DAG with one edge per distinct
    cross-component pair."""
    from g4s_spark.operators import condensation

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 4), (4, 3), (4, 5)],
        "src long, dst long",
    )
    got = sorted((r.src, r.dst) for r in condensation(edges).collect())
    # components: {1,2} -> 1, {3,4} -> 3, {5} -> 5
    assert got == [(1, 3), (3, 5)]


def test_topological_layers(spark):
    """Longest-path layering; cycles raise instead of spinning."""
    import pytest as _pytest

    from g4s_spark.operators import condensation, topological_layers

    dag = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r.id: r.layer for r in topological_layers(dag).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with _pytest.raises(RuntimeError, match="cycle"):
        topological_layers(cyc, max_iters=8)
    # the documented recipe: condensation first, then layer
    got = {r.id: r.layer for r in topological_layers(condensation(cyc.unionByName(
        spark.createDataFrame([(2, 3)], "src long, dst long")
    ))).collect()}
    assert got == {1: 0, 3: 1}


def test_k_truss(spark):
    """k-truss peel: K4 is a 4-truss; pendant and bridge edges peel at
    k=3; peeling cascades (an edge's support drops when its triangle
    partners are removed)."""
    import pytest as _pytest

    from g4s_spark.operators import k_truss

    # K4 on {1,2,3,4} plus a pendant edge 4-5
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    edges = spark.createDataFrame(k4 + [(4, 5)], "src long, dst long")
    got = sorted((r.src, r.dst) for r in k_truss(edges, k=3).collect())
    assert got == sorted(k4)           # pendant edge peeled
    got = sorted((r.src, r.dst) for r in k_truss(edges, k=4).collect())
    assert got == sorted(k4)           # every K4 edge has support 2
    got = k_truss(edges, k=5).collect()
    assert got == []                   # nothing has support 3
    # cascade: triangle 1-2-3 with a tail triangle 3-4-5 sharing node 3
    # only via edge 3-4 — removing weak edges cascades
    tri2 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)], "src long, dst long"
    )
    got = sorted((r.src, r.dst) for r in k_truss(tri2, k=3).collect())
    assert got == [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)]
    with _pytest.raises(ValueError, match="k >= 3"):
        k_truss(edges, k=2)


def _brandes_ref(edge_list, nodes):
    """Pure-python directed Brandes (the literature algorithm) as the
    test oracle."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s_, d_ in edge_list:
        adj[s_].append(d_)
    bc = defaultdict(float)
    for s in nodes:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = [s]
        q = deque([s])
        preds = defaultdict(list)
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = defaultdict(float)
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return dict(bc)


def test_betweenness_centrality(spark):
    """Batched multi-source Brandes vs a pure-python replica: diamond
    with a tail (split path counts), plus a sampled-sources run."""
    from pyspark.sql import functions as F

    from g4s_spark.graph import PropertyGraph
    from g4s_spark.operators import betweenness_centrality

    edge_list = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (2, 5)]
    nodes = [1, 2, 3, 4, 5]
    g = PropertyGraph(
        spark.createDataFrame([(n, "N") for n in nodes], "id long, label string"),
        spark.createDataFrame(edge_list, "src long, dst long").withColumn(
            "type", F.lit("E")
        ),
        spark,
    )
    want = _brandes_ref(edge_list, nodes)
    got = {r.id: r.bc for r in betweenness_centrality(g).collect()}
    for n in nodes:
        assert got.get(n, 0.0) == pytest.approx(want.get(n, 0.0)), n
    # sampled sources: only their dependencies count
    want2 = _brandes_ref(edge_list, [1, 3])
    got2 = {r.id: r.bc for r in betweenness_centrality(g, sources=[1, 3]).collect()}
    for n in nodes:
        assert got2.get(n, 0.0) == pytest.approx(want2.get(n, 0.0)), n
    # VERDICT r9 #2: exact all-sources mode refuses graphs above the
    # threshold — the O(|V| x reached) state blow-up can't ship silently
    with pytest.raises(ValueError, match="max_exact_nodes"):
        betweenness_centrality(g, max_exact_nodes=3)
    # explicit sources bypass the guard regardless of size
    betweenness_centrality(g, sources=[1], max_exact_nodes=1).collect()


def test_weighted_closeness_and_harmonic(spark):
    """weighted=True routes through the min-plus SSSP fixpoint."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.operators import closeness_centrality, harmonic_centrality

    nodes = spark.createDataFrame(
        [(i, "N") for i in range(4)], "id long, label string"
    )
    edges = spark.createDataFrame(
        [(0, 1, "E", 2.0), (1, 2, "E", 3.0), (0, 3, "E", 10.0), (1, 3, "E", 1.0)],
        "src long, dst long, type string, weight double",
    )
    g = PropertyGraph(nodes, edges, spark)
    # dists from 0: 1->2, 2->5, 3->3 (through 1, not the direct 10)
    r = closeness_centrality(g, [0], weighted=True).collect()[0]
    assert r.n_reachable == 3
    assert r.closeness == pytest.approx(3 / (2 + 5 + 3))
    h = harmonic_centrality(g, [0], weighted=True).collect()[0]
    assert h.harmonic == pytest.approx(1 / 2 + 1 / 5 + 1 / 3)
    # unweighted twin counts hops
    h2 = harmonic_centrality(g, [0]).collect()[0]
    assert h2.harmonic == pytest.approx(1 + 1 + 1 / 2)


def test_reciprocity(spark):
    from g4s_spark.operators import reciprocity

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (5, 5)], "src long, dst long"
    )
    r = reciprocity(edges).collect()[0]
    # self-loop excluded; mutual: (1,2),(2,1),(3,4),(4,3)
    assert (r.n_edges, r.n_mutual) == (5, 4)
    assert r.reciprocity == pytest.approx(0.8)


def test_neighbor_agg(spark):
    """GraphSAGE-style neighbor aggregation (round-10): hop 1 reduces
    out-neighbor features; hop 2 aggregates hop-1 AGGREGATES (layered
    ego summaries, not the flat 2-hop multiset); nodes with no
    feature-carrying neighborhood drop (inner semantics)."""
    from g4s_spark.operators import neighbor_agg

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    feats = spark.createDataFrame(
        [(2, 10.0, 1.0), (3, 20.0, 2.0), (4, 40.0, 4.0)],
        "id long, x double, y double",
    )
    got = {r.id: (r.x, r.y)
           for r in neighbor_agg(edges, feats, agg="sum").collect()}
    # node 1 -> {2,3}: x 30, y 3; node 2 -> {3}; node 3 -> {4}
    assert got == {1: (30.0, 3.0), 2: (20.0, 2.0), 3: (40.0, 4.0)}
    got_mean = {r.id: r.x
                for r in neighbor_agg(edges, feats, agg="mean").collect()}
    assert got_mean == {1: 15.0, 2: 20.0, 3: 40.0}
    # hop 2: node 1 aggregates the HOP-1 sums of {2, 3} = {20, 40}
    got2 = {r.id: (r.x, r.y)
            for r in neighbor_agg(edges, feats, agg="sum", hops=2).collect()}
    assert got2 == {1: (60.0, 6.0), 2: (40.0, 4.0)}
    import pytest as pt

    with pt.raises(ValueError, match="agg must be"):
        neighbor_agg(edges, feats, agg="median")
    with pt.raises(ValueError, match="hops"):
        neighbor_agg(edges, feats, hops=0)


def test_common_neighbor_scores_vs_replica(spark):
    """Weighted common-neighbor indexes (round-11): resource_allocation
    Σ 1/deg(w) and adamic_adar Σ 1/ln(deg(w)) vs a per-pair python
    replica on a small undirected graph; 'common' equals the shared
    count; unknown index rejected."""
    import math

    import pytest as pt

    from g4s_spark.operators import common_neighbor_scores

    # square 0-1-2-3-0 plus diagonal 0-2 (canonical a < b)
    pairs_py = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)]
    pairs = spark.createDataFrame(pairs_py, "a long, b long")
    adj = {}
    for a, b in pairs_py:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def replica(weight):
        want = {}
        nodes = sorted(adj)
        for i, x in enumerate(nodes):
            for y in nodes[i + 1:]:
                shared = adj[x] & adj[y]
                if shared:
                    want[(x, y)] = (
                        len(shared), sum(weight(len(adj[w])) for w in shared)
                    )
        return want

    for index, weight in [
        ("common", lambda d: 1.0),
        ("resource_allocation", lambda d: 1.0 / d),
        ("adamic_adar", lambda d: 1.0 / math.log(d)),
    ]:
        got = {
            (r.x, r.y): (r.shared, r.score)
            for r in common_neighbor_scores(pairs, index=index).collect()
        }
        want = replica(weight)
        assert set(got) == set(want), index
        for k in want:
            assert got[k][0] == want[k][0], (index, k)
            assert got[k][1] == pt.approx(want[k][1], rel=1e-12), (index, k)
    with pt.raises(ValueError, match="index"):
        common_neighbor_scores(pairs, index="katz")

    # defensive normalization (ADVICE r11): duplicate rows, mirrored
    # (b,a) rows, and self-loops must NOT inflate deg(w) / scores —
    # the noisy input yields byte-identical results to the clean one
    noisy = spark.createDataFrame(
        pairs_py + [(1, 0), (2, 0), (0, 1), (3, 3)], "a long, b long"
    )
    for index in ("common", "resource_allocation", "adamic_adar"):
        clean = {
            (r.x, r.y): (r.shared, r.score)
            for r in common_neighbor_scores(pairs, index=index).collect()
        }
        got = {
            (r.x, r.y): (r.shared, r.score)
            for r in common_neighbor_scores(noisy, index=index).collect()
        }
        assert got == clean, index


def test_random_walks_deterministic_vs_replica(spark):
    """Deterministic walks (round-11): every step's neighbor choice is
    argmin md5(seed:start:rep:t:v), reproduced here with hashlib —
    engine-independent, partitioning-independent; dead ends truncate;
    walks_per_node replicas draw independently."""
    import hashlib

    from g4s_spark.operators import random_walks

    edges_py = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 0), (3, 3)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    out = {
        (r.start, r.rep, r.step): r.node
        for r in random_walks(edges, length=4, walks_per_node=2, seed=7).collect()
    }
    adj = {}
    for s, d in edges_py:
        adj.setdefault(s, []).append(d)

    def pick(start, rep, t, u):
        nbrs = adj.get(u, [])
        if not nbrs:
            return None
        key = lambda v: hashlib.md5(f"7:{start}:{rep}:{t}:{v}".encode()).hexdigest()
        return min(nbrs, key=key)

    want = {}
    for start in sorted({s for s, _ in edges_py}):
        for rep in (0, 1):
            u = start
            want[(start, rep, 0)] = u
            for t in range(1, 5):
                u = pick(start, rep, t, u)
                if u is None:
                    break
                want[(start, rep, t)] = u
    assert out == want
    # same inputs -> identical walks (no rand(), no partition effects)
    out2 = {
        (r.start, r.rep, r.step): r.node
        for r in random_walks(edges, length=4, walks_per_node=2, seed=7).collect()
    }
    assert out2 == out
    # a different seed genuinely changes at least one choice
    out3 = {
        (r.start, r.rep, r.step): r.node
        for r in random_walks(edges, length=4, walks_per_node=2, seed=8).collect()
    }
    assert out3 != out


def test_hits_sparse_loop_broadcasts_and_zero_exchange_halfstep(spark):
    """Round-17 sparse rewrite of hits: (a) a half-step aggregation over
    the dst-partitioned edge cache runs with NO shuffle exchange above
    the cache scan (the broadcast vector join preserves the cache
    layout); (b) the returned frame attaches zeros with broadcast joins,
    never SortMergeJoin; (c) values match the dense definition."""
    from pyspark.sql import functions as F

    from g4s_spark.operators.algorithms import _cached_typed_edges, hits

    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(i, "V") for i in range(5)],
        edges=[(0, 1, "E"), (0, 2, "E"), (1, 2, "E"), (3, 2, "E")],
    )
    out = hits(g, iters=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the half-step shape: broadcast vector into the partitioned cache,
    # aggregate by the partition key — no exchange above the cache scan
    e_dst = _cached_typed_edges(g, None, ("src", "dst"), "dst")
    e_dst.count()
    vec = spark.createDataFrame([(0, 1.0), (1, 0.5)], "id long, s double")
    half = (
        F.broadcast(vec).join(e_dst, vec.id == e_dst.src)
        .select(F.col("dst").alias("id"), F.col("s"))
        .groupBy("id").agg(F.sum("s").alias("s"))
    )
    hplan = half._jdf.queryExecution().executedPlan().toString()
    above_cache = hplan.split("InMemoryRelation", 1)[0]
    assert "Exchange hashpartitioning" not in above_cache, above_cache
    assert "InMemoryTableScan" in above_cache, above_cache
    # node 4 has no edges at all: present with exact zeros (final attach)
    rows = {r.id: (r.hub, r.auth) for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[4] == (0.0, 0.0)
    assert rows[2][1] > 0 and rows[0][0] > 0


def test_eigenvector_sparse_loop_matches_dense_reference(spark):
    """Round-17 sparse rewrite of eigenvector_centrality: the loop drops
    exact-zero rows (IEEE no-op) and attaches zeros once at the end —
    the result must equal the dense per-iteration recomputation
    bit-for-bit, and no-inlink nodes must be exactly 0.0."""
    from g4s_spark.operators.algorithms import eigenvector_centrality

    edges = [(0, 1, "E"), (1, 2, "E"), (2, 0, "E"), (3, 0, "E")]
    g = PropertyGraph.from_tuples(
        spark, nodes=[(i, "V") for i in range(5)], edges=edges
    )
    got = {r.id: r.ec for r in eigenvector_centrality(g, iters=3).collect()}
    # dense reference: x <- (sum of in-scores), L1-normalized, from 1/n
    import collections

    n = 5
    x = {i: 1.0 / n for i in range(n)}
    for _ in range(3):
        m = collections.defaultdict(float)
        for s, d, _t in edges:
            m[d] += x[s]
        total = sum(m.values()) or 1.0
        x = {i: m.get(i, 0.0) / total for i in range(n)}
    assert got == x, (got, x)
    assert got[3] == 0.0 and got[4] == 0.0  # no in-edges -> exact zero
