"""Corpus sampling and sequence packing for training-data pipelines.

These are the selection/layout steps between curation and training:
down-sample a corpus deterministically (exact reproducibility across
reruns and engines beats `df.sample`'s RNG), re-weight sources/languages
(stratified rates), and pack documents into fixed-token-budget training
sequences.

All three are pure JVM-side column expressions — sampling is a
shuffle-free narrow filter however large the corpus; packing shuffles
once on the shard key and runs one window per shard partition. The
sampling hash is an md5 prefix (not xxhash64) so a SQL oracle on any
engine reproduces the exact row set bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as TX

# 8 hex digits = 32 bits of md5 prefix; rates resolve to 1/2^32
SAMPLE_HEX_DIGITS = 8
_SAMPLE_SPACE = 16 ** SAMPLE_HEX_DIGITS


def _md5_bucket(key: Column, seed: int) -> Column:
    """Deterministic uniform value in [0, 16^8) from a seeded md5 prefix.

    md5 (not xxhash64/hash) so DuckDB/Trino/Spark all agree:
    CAST('0x' || substr(md5(seed || ':' || key), 1, 8) AS BIGINT).
    """
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))
    return F.conv(F.substring(h, 1, SAMPLE_HEX_DIGITS), 16, 10).cast("long")


def sample_threshold(rate: float) -> int:
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"sample rate must be in [0,1], got {rate}")
    return int(rate * _SAMPLE_SPACE)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows, keyed on `key_col`.

    Unlike df.sample(), the kept set is a pure function of (key, seed):
    stable across reruns, engines, partitionings, and cluster sizes —
    the property a 100 TB corpus snapshot needs for reproducible
    training mixes. Narrow (no shuffle); the filter pushes to the scan.
    """
    return df.where(_md5_bucket(F.col(key_col), seed) < F.lit(sample_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: re-weight a corpus by source /
    language with exact, reproducible rates (e.g. up-weight books,
    down-weight web crawl). One CASE expression — still narrow."""
    thresh: Column = F.lit(sample_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = (
            F.when(F.col(strata_col) == F.lit(value), F.lit(sample_threshold(rate)))
            .otherwise(thresh)
        )
    return df.where(_md5_bucket(F.col(key_col), seed) < thresh)


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences.

    Contiguous-fill packing per shard: documents are sharded by a
    deterministic hash of their id, ordered by id within the shard, and
    cut into sequences every `budget_tokens` of cumulative token count.
    Output: (doc_id, shard, n_tokens, seq_id, seq_offset) where seq_id
    is the sequence ordinal within the shard and seq_offset the token
    position at which the document starts in its sequence.

    Scale: ONE hash-partitioned shuffle on `shard`, then a per-partition
    window — no global sort. n_shards should be >= the cluster's
    parallelism at the target corpus size; packing quality (tail waste)
    is unaffected by shard count. A document longer than the budget
    spills over sequence boundaries, as in real sequence packing where
    long documents are split across contexts.
    """
    toks = F.size(TX.tokens(F.col(text_col))).cast("long")
    shard = F.pmod(_md5_bucket(F.col(id_col), seed), F.lit(n_shards))
    base = df.select(
        F.col(id_col), shard.alias("shard"), toks.alias("n_tokens")
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(cum_before / F.lit(budget_tokens)).cast("long").alias("seq_id"),
        F.pmod(cum_before, F.lit(budget_tokens)).cast("long").alias("seq_offset"),
    )


def rates_for_token_budget(
    df: DataFrame,
    targets: dict[str, float],
    total_tokens: int,
    strata_col: str = "source",
    text_col: str = "text",
) -> dict[str, float]:
    """Derive per-stratum sampling rates that hit a target token-budget
    mix: rate(s) = min(1, targets[s]·total_tokens / available_tokens(s)).
    The returned dict feeds stratified_sample / pretrain_mix directly —
    "30% books, 60% web, 10% code at 500B tokens" becomes rates without
    hand-tuning.

    One aggregation job (per-stratum token counts, map-side combined);
    the dict math is driver-side over |strata| rows. A stratum whose
    target exceeds its available tokens caps at 1.0 — callers can
    detect under-supplied strata by comparing the returned rate to 1.0.
    Targets need not sum to 1; they are read as independent fractions
    of ``total_tokens``."""
    if any(t < 0 for t in targets.values()):
        raise ValueError("token-budget targets must be non-negative")
    toks = F.size(TX.tokens(F.col(text_col))).cast("long")
    avail = {
        r[strata_col]: int(r["n"])
        for r in df.select(F.col(strata_col), toks.alias("t"))
        .groupBy(strata_col).agg(F.sum("t").alias("n")).collect()
    }
    rates = {}
    for s, frac in targets.items():
        have = avail.get(s, 0)
        want = frac * total_tokens
        rates[s] = 1.0 if have == 0 else min(1.0, want / have)
    return rates


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size token-window chunks with overlap
    — the context-window preprocessing step between curation and
    training. Chunk i covers whitespace tokens [i·stride, i·stride +
    chunk_tokens) with stride = chunk_tokens − overlap; the final chunk
    keeps the tail, and trailing starts whose window would add no new
    tokens (entirely inside the previous chunk) are dropped.

    Output: (id_col, chunk_id long, chunk_text string, n_tokens long).

    Scale: a narrow per-row split + one explode — no shuffle, output
    rows bounded by total-token-count/stride. The token definition is
    whitespace (matching text.token_count); swap the split pattern for
    a BPE-ish regex when the tokenizer matters."""
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    return (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
        .select(
            id_col,
            "_toks",
            F.explode(
                F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
            ).alias("_start"),
        )
        # a start > 0 adds new tokens iff start + overlap < n
        .filter((F.col("_start") == 0) | (F.col("_start") + overlap < F.size("_toks")))
        .select(
            id_col,
            (F.col("_start") / stride).cast("long").alias("chunk_id"),
            F.array_join(
                F.slice("_toks", F.col("_start") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.size("_toks") - F.col("_start"))
            .cast("long").alias("n_tokens"),
        )
    )


def deterministic_shuffle(
    df: DataFrame, key_col: str = "doc_id", seed: int = 0, n_shards: int = 64
) -> DataFrame:
    """Engine-reproducible global shuffle: every row gets a
    ``shuffle_pos`` (0-based) from ranking (md5(seed:key), key) — the
    examples-order randomization a training pipeline applies before
    sequence packing, made a pure function of (key, seed) so reruns,
    engines, and cluster sizes agree bit-for-bit (df.orderBy(rand())
    is none of those).

    Scale: NOT a single global sort. The hash space is range-sharded
    into ``n_shards`` (the shard is the hash's high bits, so shard
    order is a prefix of the global order); ranking runs per-shard in
    parallel and the global position adds driver-side shard offsets
    (n_shards scalars — same driver-size class as the IVF centroids).
    An unpartitioned window would move the corpus to ONE task."""
    width = _SAMPLE_SPACE // n_shards
    h = _md5_bucket(F.col(key_col), seed)
    base = df.withColumn("_h", h).withColumn(
        "_shard", F.floor(F.col("_h") / width).cast("long")
    )
    offsets_rows = base.groupBy("_shard").count().collect()
    counts = {r["_shard"]: r["count"] for r in offsets_rows}
    offsets, acc = {}, 0
    for sh in sorted(counts):
        offsets[sh] = acc
        acc += counts[sh]
    off_col = F.create_map(
        *[x for sh, off in sorted(offsets.items()) for x in (F.lit(sh), F.lit(off))]
    )[F.col("_shard")]
    w = Window.partitionBy("_shard").orderBy(F.col("_h").asc(), F.col(key_col).asc())
    return (
        base.withColumn(
            "shuffle_pos",
            (off_col + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_h", "_shard")
    )


def split_corpus(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment: one ``split`` column
    whose value is a pure function of (key, seed) and the cumulative
    weight intervals — stable across reruns, engines, partitionings and
    cluster sizes (the property leakage-free evaluation sets need: a
    document can NEVER migrate between train and test when the corpus
    is re-processed). Weights must sum to 1 (±1e-9); interval order is
    the sorted split name order, so the assignment is reproducible from
    the weights dict alone. Narrow column expression — no shuffle, no
    sampling pass."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    bucket = _md5_bucket(F.col(key_col), seed)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < F.lit(int(acc * _SAMPLE_SPACE))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def weighted_sample(
    df: DataFrame,
    prob_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-row deterministic Bernoulli keep with row-specific
    probability (quality-weighted corpus retention: keep prob = the
    row's quality score): kept iff md5bucket(key, seed) < prob · SPACE.
    Same reproducibility contract as deterministic_sample — the kept
    set is a pure function of (key, seed, prob values); narrow, pushes
    to the scan."""
    p = F.col(prob_col).cast("double")
    return df.where(
        _md5_bucket(F.col(key_col), seed)
        < (F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0)) * _SAMPLE_SPACE)
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    key_col: str = "doc_id",
    ascending: bool = True,
    n_shards: int = 64,
) -> DataFrame:
    """Curriculum position: rank the corpus by a difficulty/quality
    score (easy-to-hard when ascending) into a global 0-based
    ``curriculum_pos``, ties broken by key so the order is total and
    reproducible.

    Scale: the same sharded two-phase rank as deterministic_shuffle,
    but range-sharded on the SCORE — per-shard boundaries come from
    exact quantiles of the score column (one percentile aggregate),
    ranking runs per-shard in parallel, and global positions add
    driver-side shard offsets. No single global sort."""
    s = F.col(score_col).cast("double")
    qs = [i / n_shards for i in range(1, n_shards)]
    bounds = df.agg(
        F.percentile(s, F.array(*[F.lit(q) for q in qs])).alias("b")
    ).collect()[0]["b"] or []
    shard = F.lit(0)
    for i, b in enumerate(bounds):
        shard = F.when(s > F.lit(float(b)), F.lit(i + 1)).otherwise(shard)
    if not ascending:
        s_order = F.col("_s").desc()
        shard_rank = {i: len(bounds) - i for i in range(len(bounds) + 1)}
    else:
        s_order = F.col("_s").asc()
        shard_rank = {i: i for i in range(len(bounds) + 1)}
    base = df.withColumn("_s", s).withColumn("_shard", shard.cast("long"))
    counts = {
        r["_shard"]: r["count"] for r in base.groupBy("_shard").count().collect()
    }
    offsets, acc = {}, 0
    for sh in sorted(counts, key=lambda x: shard_rank.get(x, x)):
        offsets[sh] = acc
        acc += counts[sh]
    off_col = F.create_map(
        *[x for sh, off in sorted(offsets.items()) for x in (F.lit(sh), F.lit(off))]
    )[F.col("_shard")]
    w = Window.partitionBy("_shard").orderBy(s_order, F.col(key_col).asc())
    return (
        base.withColumn(
            "curriculum_pos", (off_col + F.row_number().over(w) - 1).cast("long")
        )
        .drop("_s", "_shard")
    )


def gumbel_topk_sample(
    df: DataFrame,
    log_weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Gumbel-top-k trick (Kool et al. 2019, arXiv:1903.06059; equivalently
    Efraimidis-Spirakis A-ES keys in log space): each row draws
    g = log_w − ln(−ln(u)) with u a deterministic md5-uniform of
    (key, seed), and the global top-k g-keys ARE an exact weight-
    proportional sample without replacement. The natural resampling
    step after pipeline.dsir_log_weights — log weights go in as-is, no
    exponentiation, so DSIR scores (which can be large-magnitude
    negatives) never under/overflow.

    The kept set is a pure function of (keys, seed, log-weight values):
    stable across engines, reruns, partitionings, and cluster sizes —
    and SQL-oracle-able, since md5 and ln are the only ingredients.
    u is mapped from the md5 bucket as (b + 1) / (SPACE + 2), keeping
    u strictly inside (0, 1) so both logs are finite.

    Scale shape: the Gumbel key is one narrow row expression; top-k is
    a rank-free global TakeOrderedAndProject (Spark's limit-after-sort
    physical strategy: per-partition partial top-k, then one k-row
    merge on the driver side of the exchange — never a full global
    sort at rest). Ties (impossible at md5 resolution unless keys
    collide) break by key for total order."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if "gumbel_key" in df.columns:
        raise ValueError(
            "input already has a 'gumbel_key' column; rename it before "
            "sampling (the sample key is attached under that name)"
        )
    u = (_md5_bucket(F.col(key_col), seed) + F.lit(1.0)) / F.lit(
        float(_SAMPLE_SPACE) + 2.0
    )
    g = (F.col(log_weight_col).cast("double") - F.log(-F.log(u))).alias(
        "gumbel_key"
    )
    return (
        df.withColumn("gumbel_key", g)
        .orderBy(F.col("gumbel_key").desc(), F.col(key_col).asc())
        .limit(int(k))
    )
