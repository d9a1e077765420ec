"""Deterministic sampling + sequence packing (functions.sampling)."""

import pytest
from pyspark.sql import functions as F

from g4s_spark.functions import sampling as S
from g4s_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


def test_deterministic_sample_stable_and_close_to_rate(docs):
    a = S.deterministic_sample(docs, 0.3, seed=7)
    b = S.deterministic_sample(docs, 0.3, seed=7)
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b
    n = docs.count()
    assert 0.2 * n <= len(ids_a) <= 0.4 * n
    # nested property: a lower rate with the same seed keeps a subset
    ids_small = {
        r.doc_id
        for r in S.deterministic_sample(docs, 0.1, seed=7).select("doc_id").collect()
    }
    assert ids_small <= ids_a


def test_deterministic_sample_is_narrow(docs):
    plan = S.deterministic_sample(docs, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure filter


def test_stratified_sample_respects_rates(docs):
    out = S.stratified_sample(
        docs, {"src0": 1.0, "src1": 0.0}, strata_col="source", default_rate=0.5
    )
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    all_counts = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got["src0"] == all_counts["src0"]  # rate 1.0 keeps everything
    assert "src1" not in got  # rate 0.0 drops everything
    rest_all = sum(v for k, v in all_counts.items() if k not in ("src0", "src1"))
    rest_got = sum(v for k, v in got.items() if k != "src0")
    assert 0.3 * rest_all <= rest_got <= 0.7 * rest_all


def test_pack_sequences_invariants(docs):
    packed = S.pack_sequences(docs, budget_tokens=256, n_shards=4).collect()
    assert len(packed) == docs.count()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.seq_id == cum // 256
            assert r.seq_offset == cum % 256
            cum += r.n_tokens


def test_pretrain_mix_composition(docs):
    from g4s_spark.functions import pipeline as PL

    out = PL.pretrain_mix(
        docs, min_quality=0.5, langs=("en", "und"),
        rates={"src0": 1.0}, default_rate=0.6,
        budget_tokens=256, n_shards=2, sample_seed=5,
    ).collect()
    assert out
    kept = PL.curate_corpus(docs, 0.5, ("en", "und"))
    kept_ids = {r.doc_id for r in kept.collect()}
    got_ids = {r.doc_id for r in out}
    # every packed doc survived curation; sampling only removes
    assert got_ids <= kept_ids
    assert len(got_ids) < len(kept_ids)  # default rate 0.6 drops some
    # packing invariants hold on the sampled set
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows_:
            assert r.seq_id == cum // 256 and r.seq_offset == cum % 256
            cum += r.n_tokens


def test_rates_for_token_budget(spark):
    from g4s_spark.functions.sampling import rates_for_token_budget

    df = spark.createDataFrame(
        [(1, "a b c d", "web"), (2, "a b c d e f", "web"), (3, "x y", "books")],
        "doc_id long, text string, source string",
    )
    # web has 10 tokens, books 2
    rates = rates_for_token_budget(
        df, {"web": 0.5, "books": 0.5}, total_tokens=4
    )
    assert rates["web"] == 0.2      # want 2 of 10
    assert rates["books"] == 1.0    # want 2 of 2
    capped = rates_for_token_budget(df, {"books": 1.0}, total_tokens=100)
    assert capped["books"] == 1.0   # under-supplied stratum caps


def test_chunk_documents_windows_and_tail(spark):
    """Chunk i covers [i*stride, i*stride+chunk); tail kept; a trailing
    start fully inside the previous chunk is dropped; empty docs yield
    one (degenerate) chunk, matching split('')'s single empty token."""
    from g4s_spark.functions.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in chunk_documents(docs, chunk_tokens=4, overlap=1)
           .orderBy("doc_id", "chunk_id").collect()]
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),
        (1, 2, "g h i j", 4),
        (2, 0, "x y", 2),
        (3, 0, "", 1),
    ]
    # overlap: chunk k starts at k*(chunk-overlap)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_covers_every_token(spark):
    """Every token index lands in >=1 chunk and chunk token counts sum
    to n + (chunks-1)*overlap per doc (exact overlap accounting)."""
    from pyspark.sql import functions as F

    from g4s_spark.functions.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n)))
         for i, n in [(0, 1), (1, 7), (2, 8), (3, 9), (4, 23)]],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=8, overlap=2)
    agg = (
        out.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    n_by_id = {0: 1, 1: 7, 2: 8, 3: 9, 4: 23}
    for r in agg:
        n, c = n_by_id[r.doc_id], r.c
        assert r.s == n + (c - 1) * 2, (r.doc_id, r.s, c)


def test_deterministic_shuffle_shard_invariant(spark):
    """Positions are a pure function of (key, seed): stable across
    reruns and shard counts (the shard is the hash's high bits, so the
    sharded two-phase rank equals the global rank), a permutation of
    0..n-1, and seed-sensitive."""
    from g4s_spark.functions.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    a = {r.doc_id: r.shuffle_pos for r in deterministic_shuffle(df, seed=1).collect()}
    b = {r.doc_id: r.shuffle_pos
         for r in deterministic_shuffle(df, seed=1, n_shards=4).collect()}
    c = {r.doc_id: r.shuffle_pos for r in deterministic_shuffle(df, seed=2).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(40))
    assert a != c


def test_token_budget_rates_targets_and_cap(spark):
    """Rates hit the target token distribution and cap at 1.0 — a
    source whose target exceeds its available mass keeps everything."""
    from g4s_spark.functions.pipeline import token_budget_rates

    docs = spark.createDataFrame(
        [(1, "a", "w " * 100), (2, "a", "w " * 100),   # a: 200 tokens
         (3, "b", "w " * 10)],                           # b: 10 tokens
        "doc_id long, source string, text string",
    )
    got = {r.source: r for r in token_budget_rates(
        docs, {"a": 1.0, "b": 1.0}, total_tokens=100
    ).collect()}
    assert got["a"].available_tokens == 200 and got["a"].target_tokens == 50.0
    assert got["a"].rate == 0.25
    # b's target (50) exceeds its 10 available tokens -> capped
    assert got["b"].rate == 1.0


def test_apply_token_budget_deterministic_and_drops_unweighted(spark):
    from g4s_spark.functions.pipeline import apply_token_budget

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "c", "w " * 20) for i in range(40)],
        "doc_id long, source string, text string",
    )
    kept1 = sorted(r.doc_id for r in apply_token_budget(
        docs, {"a": 1.0}, total_tokens=100, seed=3
    ).collect())
    kept2 = sorted(r.doc_id for r in apply_token_budget(
        docs, {"a": 1.0}, total_tokens=100, seed=3
    ).collect())
    assert kept1 == kept2 and kept1  # deterministic, non-empty
    assert all(i % 2 for i in kept1)  # unweighted source 'c' dropped
    # 100 target of 400 available -> about a quarter of the 20 'a' docs
    assert 1 <= len(kept1) <= 12


def test_token_budget_rates_validates_inputs(spark):
    from g4s_spark.functions.pipeline import token_budget_rates
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
    with _pytest.raises(ValueError, match="positive"):
        token_budget_rates(docs, {"a": 1.0}, total_tokens=0)
    with _pytest.raises(ValueError, match="weight"):
        token_budget_rates(docs, {}, total_tokens=10)


def test_split_corpus(spark):
    """Deterministic train/val/test splits (round-8): stable across
    reruns, proportions approximately honored, weights validated."""
    import pytest as _pytest

    from g4s_spark.functions.sampling import split_corpus

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in split_corpus(df, w).collect()}
    b = {r.doc_id: r.split for r in split_corpus(df, w).collect()}
    assert a == b                      # pure function of (key, seed)
    from collections import Counter
    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 <= c["train"] / 2000 <= 0.85
    assert 0.06 <= c["val"] / 2000 <= 0.14
    # different seed reshuffles membership but keeps proportions
    d = {r.doc_id: r.split for r in split_corpus(df, w, seed=7).collect()}
    assert d != a
    with _pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, {"train": 0.5})


def test_curriculum_order(spark):
    """Global score rank without a global sort: positions are the exact
    total order (score, key), ascending or descending."""
    from pyspark.sql import functions as F

    from g4s_spark.functions.sampling import curriculum_order

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id").withColumn(
        "score", (F.col("doc_id") * 37 % 101).cast("double")
    )
    rows = curriculum_order(df, "score", n_shards=8).collect()
    by_pos = sorted(rows, key=lambda r: r.curriculum_pos)
    assert [r.curriculum_pos for r in by_pos] == list(range(500))
    seq = [(r.score, r.doc_id) for r in by_pos]
    assert seq == sorted(seq)
    rows = curriculum_order(df, "score", ascending=False, n_shards=8).collect()
    by_pos = sorted(rows, key=lambda r: r.curriculum_pos)
    seq = [(-r.score, r.doc_id) for r in by_pos]
    assert seq == sorted(seq)


def test_dsir_log_weights_vs_replica(spark):
    """dsir_log_weights (round-15, staged r16 debut — Xie et al. 2023):
    hashed-unigram importance scores vs an exact hashlib/python replica
    of the same md5 bucketing and smoothed log-ratio."""
    import hashlib
    import math
    from collections import Counter

    from g4s_spark.functions.pipeline import dsir_log_weights

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "der hund lief im park", "de"),
        (3, "the dog ran in the park", "en"),
        (4, "cat dog park mat", "en"),
        (5, "xyz qqq zzz", "xx"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    B, seed, alpha = 64, 0, 1.0

    def bucket(tok):
        h = hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()
        return int(h[:8], 16) % B

    def toks(s):
        import re
        return re.findall(r"[a-z0-9]+", s.lower())

    raw_c, tgt_c = Counter(), Counter()
    for _id, text, lang in rows:
        bs = [bucket(t) for t in toks(text)]
        raw_c.update(bs)
        if lang == "en":
            tgt_c.update(bs)
    R, T = sum(raw_c.values()), sum(tgt_c.values())
    want = {}
    for _id, text, lang in rows:
        cs = Counter(bucket(t) for t in toks(text))
        lw = sum(
            c * (math.log((tgt_c.get(b, 0) + alpha) / (T + alpha * B))
                 - math.log((raw_c[b] + alpha) / (R + alpha * B)))
            for b, c in cs.items()
        )
        want[_id] = (sum(cs.values()), lw)

    got = {
        r.doc_id: (r.n_feat, r.log_weight)
        for r in dsir_log_weights(
            docs, docs.filter("lang = 'en'"), n_buckets=B, alpha=alpha
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-9, k
    # English docs score higher than the German/gibberish ones
    assert min(got[1][1], got[3][1]) > max(got[2][1], got[5][1])


def test_gumbel_topk_sample_vs_replica(spark):
    """gumbel_topk_sample (round-15, staged r17 debut — Kool 2019):
    exact weight-proportional sampling without replacement; the top-k
    set and key values match a hashlib/python replica, and heavier
    rows win more often (sanity: the max-weight row is in the top-k
    here by construction)."""
    import hashlib
    import math

    from g4s_spark.functions.sampling import gumbel_topk_sample

    rows = [(i, float(i + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    df = df.withColumn("lw", F.log("w"))

    SPACE = 16 ** 8

    def gkey(doc_id, w):
        h = hashlib.md5(f"0:{doc_id}".encode()).hexdigest()
        u = (int(h[:8], 16) + 1.0) / (SPACE + 2.0)
        return math.log(w) - math.log(-math.log(u))

    want = sorted(rows, key=lambda r: (-gkey(*r), r[0]))[:10]
    got = gumbel_topk_sample(df, "lw", k=10).collect()
    assert [r.doc_id for r in got] == [r[0] for r in want]
    for r, (wid, ww) in zip(got, want):
        assert abs(r.gumbel_key - gkey(wid, ww)) < 1e-9
    with pytest.raises(ValueError, match="k must be"):
        gumbel_topk_sample(df, "lw", k=0)
    # a pre-existing gumbel_key column would be silently overwritten —
    # refuse loudly instead (ADVICE r15)
    with pytest.raises(ValueError, match="gumbel_key"):
        gumbel_topk_sample(df.withColumn("gumbel_key", F.lit(0.0)), "lw", k=5)
