"""End-to-end corpus curation — the composed operation a training-data
pipeline runs over a raw document table: quality scoring x language
filter x duplicate-cluster representative selection, producing the kept
training set. Each stage is one of this package's oracle-checked
operators. The scoring/filter stages compose lazily (pure DataFrame
joins, predicates stay pushable); the dedup stage materializes eagerly —
dedup_clusters runs the LSH pair join and the iterative component loop
as jobs at build time, since iterative connected components cannot be
expressed as one Catalyst plan.

Scale shape: quality/lang are per-row expressions (no shuffle beyond the
joins); dedup representatives come from the bucketed LSH + pair-graph
components path (dedup.dedup_clusters) — the only stages that shuffle
are keyed on doc_id / LSH buckets, never on pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters
from .sampling import pack_sequences, stratified_sample
from .text import lang_id, quality_score


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
    rep_score_col: str | None = None,
) -> DataFrame:
    """Kept documents: (doc_id, pred_lang, quality) for documents that
    (1) score at least min_quality, (2) classify into one of ``langs``,
    and (3) are their duplicate-cluster's representative — minimum doc
    id (deterministic keep-first, the default), or the cluster's
    highest-``rep_score_col`` row when one is named (round-10
    quality-aware keep via dedup.select_canonical; ties still fall to
    the lowest id)."""
    q = quality_score(df, text_col, id_col).select(id_col, "quality")
    l = lang_id(df, text_col, id_col)
    clusters = dedup_clusters(df, text_col, id_col)
    if rep_score_col is None:
        reps = clusters.filter(F.col("cluster") == F.col(id_col)).select(id_col)
    else:
        from .dedup import select_canonical

        reps = select_canonical(
            df.select(id_col, rep_score_col), clusters,
            score_col=rep_score_col, id_col=id_col,
        ).select(id_col)
    return (
        df.select(id_col)
        .join(q.filter(F.col("quality") >= min_quality), on=id_col)
        .join(l.filter(F.col("pred_lang").isin(list(langs))), on=id_col)
        .join(reps, on=id_col)
        .select(id_col, "pred_lang", "quality")
    )


def pretrain_mix(
    df: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    rates: dict[str, float] | None = None,
    strata_col: str = "source",
    default_rate: float = 1.0,
    budget_tokens: int = 2048,
    n_shards: int = 8,
    sample_seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full selection/layout pipeline from raw documents to training
    sequences: curate (quality x language x dedup representative) ->
    stratified source re-weighting -> token-budget sequence packing.
    Output: (doc_id, shard, n_tokens, seq_id, seq_offset) — a
    deterministic training-mix manifest.

    Scale: curation's dedup stage is the only eager step (iterative
    components); sampling is a narrow filter; packing adds exactly one
    shuffle on the shard key. Nothing here is keyed on pairs or requires
    a global sort."""
    kept = curate_corpus(df, min_quality, langs, text_col, id_col).select(id_col)
    kept_docs = df.join(kept, on=id_col)
    sampled = stratified_sample(
        kept_docs, rates or {}, strata_col, default_rate, id_col, sample_seed
    )
    return pack_sequences(sampled, budget_tokens, n_shards, text_col, id_col)


def corpus_report(
    docs: DataFrame, group_cols: tuple[str, ...] = ("source",),
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus statistics — the inspection report a curation
    pipeline prints before/after each stage: document count, token and
    character totals, mean/median/min/max document length.

    All aggregates are exact-integer sums plus one final double
    division (mean) and an interpolated percentile (median) — both
    bit-reproducible across engines (the float-summation-order trap of
    averaging per-row doubles is deliberately avoided; see
    rel_quantiles for the percentile parity evidence).

    Scale: one narrow per-row projection + ONE shuffle on the group
    key; output is |groups| rows."""
    from .text import tokens

    t = tokens(F.col(text_col))
    base = docs.select(
        *group_cols,
        F.size(t).cast("long").alias("_nt"),
        F.length(text_col).cast("long").alias("_nc"),
    )
    n = F.count(F.lit(1))
    return base.groupBy(*group_cols).agg(
        n.cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("total_tokens"),
        F.sum("_nc").cast("long").alias("total_chars"),
        (F.sum("_nt").cast("double") / n).alias("mean_tokens"),
        F.percentile(F.col("_nt"), F.lit(0.5)).alias("median_tokens"),
        F.min("_nt").cast("long").alias("min_tokens"),
        F.max("_nt").cast("long").alias("max_tokens"),
    )


def token_budget_rates(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling rates that hit a target token distribution —
    the mix-design step before a training run: given relative source
    weights and a token budget, each source's target token mass is
    ``total_tokens * weight / Σweights`` and its rate is
    ``min(1, target / available)`` (sources cannot be up-sampled past
    1.0; re-epoching is a training-loop concern, not a sampling one).

    Output: (source, available_tokens, target_tokens, rate), one row
    per weighted source present in the corpus. Targets are computed
    driver-side from the weight dict (pure floats, engine-reproducible
    as literals); the only data-dependent inputs are the per-source
    token totals — exact integer sums.

    Scale: ONE narrow projection + one shuffle on the source key;
    output is |sources| rows."""
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    if not weights:
        raise ValueError("token_budget_rates needs at least one source weight")
    from .text import tokens

    wsum = float(sum(weights.values()))
    targets = {s: total_tokens * (w / wsum) for s, w in sorted(weights.items())}
    avail = (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(tokens(F.col(text_col))).cast("long").alias("_nt"),
        )
        .where(F.col("source").isin(list(targets)))
        .groupBy("source")
        .agg(F.sum("_nt").alias("available_tokens"))
    )
    tgt = F.create_map(
        *[x for s, t in targets.items() for x in (F.lit(s), F.lit(t))]
    )
    return avail.select(
        "source",
        "available_tokens",
        tgt[F.col("source")].alias("target_tokens"),
        F.least(
            F.lit(1.0),
            tgt[F.col("source")] / F.col("available_tokens").cast("double"),
        ).alias("rate"),
    )


def apply_token_budget(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Sample the corpus to the token budget: the tiny per-source rate
    table (|sources| rows) collects driver-side and feeds the
    stratified deterministic sampler, so the kept set is a pure
    function of (corpus, weights, total_tokens, seed) — reproducible
    across engines, reruns, and cluster sizes. Unweighted sources drop
    (default_rate 0). The sampler threshold is ``int(rate * 16^8)``
    (truncation == floor for rates in [0,1]); a SQL oracle reproduces
    it as FLOOR(rate * 16^8) over the identical IEEE rate."""
    from .sampling import stratified_sample

    rates = {
        r.source: r.rate
        for r in token_budget_rates(
            docs, weights, total_tokens, source_col, text_col
        ).collect()
    }
    return stratified_sample(
        docs, rates, strata_col=source_col, default_rate=0.0,
        key_col=key_col, seed=seed,
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how target-like its
    hashed-unigram feature distribution is. Per document,

        log_weight = Σ_b count_b · ( ln p̂_target(b) − ln p̂_raw(b) )

    over md5-hashed token buckets b (the paper's hashed n-gram features
    with additive smoothing α: p̂(b) = (c_b + α) / (C + α·B)).
    High-weight documents resemble the target corpus; compose with
    sampling.weighted_sample / deterministic thresholds for the actual
    resampling step. Returns (id_col, n_feat, log_weight).

    Buckets come from sampling._md5_bucket mod B — md5, not
    xxhash64/hash, so Spark, DuckDB, and hashlib agree byte-for-byte
    and the operator is SQL-oracle-able end-to-end.

    Scale shape: the raw corpus is exploded+hashed ONCE — the raw
    bucket distribution folds out of the per-doc bucket table, whose
    shuffle both consumers share (AQE exchange reuse, verified: 1
    ReusedExchange in the executed plan). Distributions are map-side-
    combinable B-row aggregates; the per-doc score is ONE broadcast
    join (the log-ratio table is ≤ B rows — a plan-literal bound,
    NEVER |corpus|) plus one doc-keyed map-side-combinable sum. The
    raw-side bucket table left-joins the target counts (a doc's
    buckets always exist on the raw side by construction, so no full
    outer is needed); ln is the single transcendental — round at the
    comparison boundary like adamic_adar."""
    from .sampling import _md5_bucket
    from .text import tokens

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    b = lambda c: F.pmod(_md5_bucket(c, seed), F.lit(int(n_buckets)))  # noqa: E731

    def bucket_counts(df: DataFrame, name: str) -> DataFrame:
        t = df.select(F.explode(tokens(F.col(text_col))).alias("_tok"))
        return (
            t.select(b(F.col("_tok")).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    docb = (
        raw.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok"))
        .select(id_col, b(F.col("_tok")).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # the raw distribution folds out of the per-doc table — the corpus
    # is exploded+hashed ONCE, not twice (at 100 TB the explode over
    # the raw side is the dominant cost; everything downstream is
    # B-row bounded)
    rawb = docb.groupBy("bucket").agg(F.sum("_c").alias("r_n"))
    tgtb = bucket_counts(target, "t_n")
    r_tot = rawb.agg(F.sum("r_n").alias("_rt"))
    t_tot = tgtb.agg(F.sum("t_n").alias("_tt"))
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha) * float(n_buckets))
    ratio = (
        rawb.join(tgtb, on="bucket", how="left")
        .crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(t_tot))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("t_n"), F.lit(0)) + a) / (F.col("_tt") + ab))
                - F.log((F.col("r_n") + a) / (F.col("_rt") + ab))
            ).alias("lr"),
        )
    )
    return (
        docb.join(F.broadcast(ratio), on="bucket")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_feat"),
            F.sum(F.col("_c") * F.col("lr")).alias("log_weight"),
        )
    )
