"""Text-analysis operators for training-data pipelines (north-star surface
beyond the reference, BASELINE.json:6): tokenization, quality scoring,
language ID, document fingerprinting.

All pure `pyspark.sql.functions` column expressions — JVM-side, whole-stage
codegen, no Python in the hot path. Each operator has an exactly-equivalent
ANSI-SQL oracle (see __spark_entry__.oracle_sql), which pins the semantics:
token = [a-z0-9]+ run over lower(text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rounding import pround

TOKEN_RE = "[a-z0-9]+"

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]

# marker-word language ID (n-gram/stopword heuristic). Deterministic
# priority order breaks score ties: en > de > fr > es.
LANG_MARKERS = {
    "en": ["the", "a", "is", "and", "of"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}


def tokens(c: Column) -> Column:
    """array<string> of [a-z0-9]+ runs of lower(text)."""
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


# GPT-2-style pre-tokenizer, the portable (lookahead-free) form: an
# optional leading space glued to a letter run, digit run, or
# punctuation run, plus a TRAILING whitespace-run alternative (ADVICE
# r11: without it an interior run of 2+ spaces/tabs/newlines
# contributed zero pre-tokens, systematically undercounting budgets on
# whitespace-heavy text — code, markdown, indented docs). Whitespace is
# an EXPLICIT character class, not \s: Python/Java \s includes \x0B
# (vertical tab) while RE2's does not, so a \s-based pattern diverges
# across engines on \x0B-bearing text (round-12 review — found when
# the |\s+ alternative made the divergence produce different COUNTS,
# not just different token boundaries). [ \t\n\f\r] means the same
# five characters in Java, RE2, and Python re; \x0B lands in the
# punctuation class in all three. Java regex and DuckDB's RE2 share
# leftmost-first alternation, so a SQL oracle reproduces the split
# exactly — the full GPT-2 pattern's \s+(?!\S) lookahead does NOT
# exist in RE2 and is deliberately omitted; the remaining divergence
# from real GPT-2 pre-tokenization is that a whitespace run directly
# before a token counts as ONE token here where GPT-2 may split it —
# same total count for space-before-word, ±1 for tab/newline-before-
# token (BPE merges would iterate on top of these pre-tokens; counting
# them is the budget estimate pipelines need).
BPE_TOKEN_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\f\r]+|[ \t\n\f\r]+"


def bpe_tokens(c: Column) -> Column:
    """array<string> of GPT-2-ish pre-tokens (case preserved)."""
    return F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)


def token_count(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "word",
) -> DataFrame:
    """Per-document token counts under three tokenizers:

    - ``'word'`` (default): [a-z0-9]+ runs of lower(text) — the corpus
      statistics tokenizer every text_* operator here shares.
    - ``'whitespace'``: \\S+ runs — the cheapest budget estimate.
    - ``'bpe'``: GPT-2-style pre-tokens (BPE_TOKEN_RE) — the closest
      no-vocab proxy for real tokenizer budgets (pre-tokens are what
      BPE merges subdivide, so this UPPER-bounds word counts and
      tracks real token counts much closer than whitespace; interior
      whitespace runs count one pre-token per run, so code/markdown
      budgets include indentation like real GPT-2 tokenization does).

    All three are one regexp_extract_all + size per row — narrow
    projection, no shuffle, whole-stage codegen."""
    exprs = {
        "word": lambda c: tokens(c),
        "whitespace": lambda c: F.regexp_extract_all(c, F.lit(r"\S+"), 0),
        "bpe": lambda c: bpe_tokens(c),
    }
    if mode not in exprs:
        raise ValueError(f"mode must be one of {sorted(exprs)}, got {mode!r}")
    return df.select(
        F.col(id_col),
        F.size(exprs[mode](F.col(text_col))).cast("long").alias("n_tokens"),
    )


def _in_list(t: Column, words: list[str]) -> Column:
    return F.array_contains(F.array(*[F.lit(w) for w in words]), t)


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length/punctuation/stopword heuristics -> one quality number.

    quality = 0.4·min(n_tokens/100, 1) + 0.3·(1 − stop_ratio)
            + 0.3·min(mean_token_len/8, 1)
    All intermediate counts are exact integers; the two divisions and the
    final expression are single double-precision ops, so the value is
    bit-identical to the SQL oracle.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: _in_list(t, STOPWORDS))).cast("long")
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[.,;:!?]")).cast("long")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    mean_len = F.when(n_tok > 0, tok_chars / n_tok).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3) * F.least(mean_len / F.lit(8.0), F.lit(1.0))
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_punct.alias("n_punct"),
        pround(stop_ratio, 4).alias("stop_ratio"),
        pround(mean_len, 4).alias("mean_tok_len"),
        pround(quality, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language classifier -> (id, pred_lang). 'und' when no
    marker hits."""
    toks = tokens(F.col(text_col))

    def scorer(words: list[str]):
        # single-param lambda: a 2-param lambda would be read by F.filter
        # as (element, index) and bind the index to the default arg
        return lambda t: _in_list(t, words)

    scores = {
        lang: F.size(F.filter(toks, scorer(words)))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = tie-break priority
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set — robust to token order / duplication (near-dup grouping key)."""
    toks = tokens(F.col(text_col))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.select(F.col(id_col), F.md5(canon).alias("fp"))


def word_ngrams(c: Column, n: int = 3) -> Column:
    """array of space-joined word n-grams (shingles)."""
    toks = tokens(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # sequence(1, k) is DESCENDING for k < 1 — guard short docs explicitly
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals: fraction of tokens that are
    distinct, and the share of the document claimed by its most frequent
    token / word-bigram. High top-ngram shares mark boilerplate and
    degenerate (looping) text; low distinct ratios mark keyword stuffing.

    Scale shape: the per-doc mode is explode -> groupBy(doc, gram) ->
    max per doc — two shuffles both keyed by doc_id, so the second
    reuses the first's partitioning; no per-doc data ever leaves its
    partition after the first hash. All ratios are single IEEE divisions
    of exact integer counts — bit-identical to the SQL oracle."""
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    top_tok = (
        df.select(F.col(id_col), F.explode(toks).alias("g"))
        .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col).agg(F.max("c").alias("top_tok"))
    )
    top_bi = (
        df.select(F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("g"))
        .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col).agg(F.max("c").alias("top_bi"))
    )
    return (
        base.join(top_tok, id_col, "left").join(top_bi, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            pround(
                F.when(F.col("n_tokens") > 0, F.col("n_distinct") / F.col("n_tokens"))
                .otherwise(F.lit(0.0)), 6,
            ).alias("distinct_ratio"),
            pround(
                F.when(F.col("n_tokens") > 0,
                       F.coalesce(F.col("top_tok"), F.lit(0)) / F.col("n_tokens"))
                .otherwise(F.lit(0.0)), 6,
            ).alias("top_token_ratio"),
            pround(
                F.when(F.col("n_tokens") > 1,
                       F.coalesce(F.col("top_bi"), F.lit(0)) / (F.col("n_tokens") - 1))
                .otherwise(F.lit(0.0)), 6,
            ).alias("top_bigram_ratio"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    n-gram with the benchmark set (the n-gram-overlap rule used to scrub
    eval sets out of pretraining corpora; production uses n≈13).

    Scale shape: the benchmark's distinct n-gram set is usually tiny
    relative to the corpus — it broadcasts (or bucket-joins beyond the
    broadcast threshold); the corpus side is one explode + semi-join +
    distinct, never a pairwise document comparison."""
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
        .dropDuplicates(["g"])
    )
    hits = (
        corpus.select(F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
        .join(bench_grams, "g", "left_semi")
        .select(id_col).dropDuplicates([id_col])
        .withColumn("contaminated", F.lit(True))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
        )
    )


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranking of a literal query against the corpus, with the
    rational idf variant idf(t) = (N - df_t + 0.5) / (df_t + 0.5) — the
    classic log() is monotone in this ratio, so ranking order is
    identical, and staying rational keeps the score free of
    transcendentals (ln differs in the last ulp across engines, which
    would flake a bit-exact oracle).

    Scale shape: per-term tf is a column expression over the token
    array (no explode); the corpus stats (N, avgdl, per-term df) reduce
    to ONE broadcast single-row aggregate — conditional counts fold
    map-side, so the stats pass reads the corpus once."""
    toks = tokens(F.col(text_col))

    def term_eq(term: str):
        # single-param lambda: a (x, t) two-param form would be read by
        # F.filter as (element, index) and bind the term to the index
        return lambda x: x == F.lit(term)

    tf_cols = {
        t: F.size(F.filter(toks, term_eq(t))).cast("double") for t in query_terms
    }
    per_doc = df.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("dl"),
        *[tf_cols[t].alias(f"tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("N"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).cast("double").alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    j = per_doc.join(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = (F.col("N") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        tf = F.col(f"tf_{i}")
        term = idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        score = term if score is None else score + term
    return j.select(F.col(id_col), pround(score, 6).alias("bm25"))


def build_vocab(
    df: DataFrame,
    size: int | None = None,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary with stable ids: tokens ranked by total count
    (ties by token text), id 0 = most frequent — the tokenizer-training
    primitive (word-level here; BPE merges would iterate on top of these
    counts). Returns (token, count, vocab_id).

    Scale shape: one explode + groupBy(token) with map-side combine.
    When ``size`` is set, the candidate set is pre-pruned with
    orderBy().limit(size) — Spark's TakeOrderedAndProject: per-partition
    top-k + a k-row merge on the driver side of the exchange — so the
    ranking window only ever sees ``size`` rows (a 100 TB corpus can
    carry 10^8+ unique tokens past min_count; sorting them in the
    single-partition rank window would be the bottleneck). The ordering
    (count desc, token asc) is total, so pruning at exactly ``size``
    loses nothing to ties. Only the unbounded ``size=None`` path keeps
    the full-vocab single-partition rank — the trade every distributed
    dense-ranking makes, and the caller asked for every token."""
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    from pyspark.sql.window import Window

    if size is not None:
        counts = counts.orderBy(
            F.col("count").desc(), F.col("token").asc()
        ).limit(int(size))
    w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
    out = counts.withColumn("vocab_id", (F.row_number().over(w) - 1).cast("long"))
    return out.select("token", "count", "vocab_id")


def doc_frequency(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", min_df: int = 2
) -> DataFrame:
    """Corpus document-frequency table: (token, df, df_ratio) for tokens
    appearing in ≥ min_df documents — the input to stopword/boilerplate
    detection and IDF weighting in a training-data pipeline (tokens with
    df_ratio near 1.0 are boilerplate candidates).

    Scale shape: one explode + distinct + groupBy on token (map-side
    combine), with the corpus size joined in as a broadcast single-row
    aggregate — no driver-side count, the builder stays lazy. df_ratio
    stays rational (df / N, one IEEE division, engine-identical) — no
    transcendentals, so the DuckDB oracle matches bit-for-bit."""
    tot = df.agg(F.count_distinct(F.col(id_col)).alias("_n"))
    tok = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .dropDuplicates([id_col, "token"])
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(tot))
        .select("token", "df", pround(F.col("df") / F.col("_n"), 6).alias("df_ratio"))
    )


# --- privacy / normalization scrubbing (round-8) --------------------------

# Deliberately simple, portable regexes (identical semantics in Java's
# and DuckDB's engines — no lookaround, no \b-adjacent unicode classes):
# good-enough recall for corpus hygiene reporting, NOT a compliance
# boundary. At 100 TB each is one regexp_replace pass inside whole-stage
# codegen — no UDFs, no shuffle.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Replace email / phone-like / IPv4 spans with typed placeholder
    tokens and count the replacements per document: (id, redacted,
    n_email, n_phone, n_ipv4). Order matters: emails first (an email's
    host would otherwise feed the looser patterns), then IPs, then
    phone-like runs. Counting uses the same pattern via regexp_count,
    evaluated BEFORE that pattern's replacement."""
    c = F.col(text_col)
    counts = {}
    for kind in ("email", "ipv4", "phone"):
        counts[kind] = F.regexp_count(c, F.lit(PII_PATTERNS[kind]))
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return df.select(
        F.col(id_col),
        c.alias("redacted"),
        counts["email"].cast("long").alias("n_email"),
        counts["phone"].cast("long").alias("n_phone"),
        counts["ipv4"].cast("long").alias("n_ipv4"),
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus hygiene normalization: strip control characters (except
    \\t \\n), collapse runs of spaces/tabs, trim — returning (id, text,
    n_control, n_collapsed) so the pipeline can ALSO report how dirty
    the source was (mojibake/control density is a standard quality
    signal). Pure column expressions; streaming-safe."""
    raw = F.col(text_col)
    ctrl = r"[\x00-\x08\x0b-\x1f\x7f]"
    runs = r"[ \t]{2,}"
    return df.select(
        F.col(id_col),
        F.trim(
            F.regexp_replace(F.regexp_replace(raw, ctrl, ""), runs, " ")
        ).alias("text"),
        F.regexp_count(raw, F.lit(ctrl)).cast("long").alias("n_control"),
        F.regexp_count(raw, F.lit(runs)).cast("long").alias("n_collapsed"),
    )


def _segment(
    df: DataFrame, text_col: str, id_col: str, sep: str
) -> DataFrame:
    """Shared segmenter for the line-dedup family: (id, pos, line) rows
    via posexplode over a literal-separator split. ONE definition so
    dedup_lines, common_lines, and dedup_lines_against provably
    segment identically (retirement-candidate evidence, NOTES r16+)."""
    import re as _re

    return df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep), -1)
        ).alias("pos", "line"),
    )


def _reassemble(kept: DataFrame, id_col: str, sep: str) -> DataFrame:
    """Shared ordered-reassembly aggregate: surviving (id, pos, line)
    rows back into one document per id, original order."""
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            sep,
        ).alias("_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Line-level corpus dedup (the RefinedWeb/CCNet pass): drop every
    segment that appears verbatim in >= ``min_docs`` DISTINCT documents
    (boilerplate: headers, nav bars, license blocks), reassemble each
    document from its surviving segments in original order. Returns
    (id, text, n_kept, n_removed); a document whose every segment is
    boilerplate keeps an empty text rather than vanishing.

    ``sep`` is a literal separator (escaped before Spark's regex
    split); the default splits on newlines.

    Scale shape: posexplode (narrow, ~lines-per-doc fanout) -> ONE
    shuffle on the segment value for the distinct-doc counts -> anti
    join on segment (shuffle join; the common-segment side is tiny but
    unbounded, so no broadcast assumption) -> ONE shuffle back on doc
    id for the ordered reassembly. Nothing is pairwise; 100 TB of
    documents is ~3 segment-keyed passes. The segment groupBy combines
    map-side (count-distinct per segment over sorted ids).

    Composition (shared helpers, round-15): this IS
    ``common_lines(df)`` anti-joined via the ``dedup_lines_against``
    path (same _segment / _reassemble), plus the totals join that
    keeps fully-boilerplate documents as empty text with an n_removed
    count — the incremental twin drops them (its batch has no totals
    side)."""
    lines = _segment(df, text_col, id_col, sep)
    common = common_lines(df, text_col, id_col, sep, min_docs)
    kept = lines.join(common, on="line", how="left_anti")
    agg = _reassemble(kept, id_col, sep)
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_total")
    )
    return (
        df.select(id_col)
        .join(agg, on=id_col, how="left")
        .join(totals, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("_text"), F.lit("")).alias("text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def common_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """The boilerplate-segment index dedup_lines derives internally:
    one ``line`` column of segments appearing in >= ``min_docs``
    distinct documents. Persist it (parquet) to reuse across ingest
    batches — the corpus is scanned once, not per batch."""
    lines = _segment(df, text_col, id_col, sep)
    # blank segments excluded: structural, never boilerplate (round-9,
    # ADVICE r8): two documents sharing a blank line must not push it
    # over min_docs, or paragraph breaks collapse on reassembly
    return (
        lines.filter(F.trim(F.col("line")) != "")
        .groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("line")
    )


def dedup_lines_against(
    new_docs: DataFrame,
    line_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """dedup_lines, but against a PRE-BUILT boilerplate index
    (common_lines): the ingest batch is segmented and anti-joined on
    the segment — the corpus is never rescanned; the line-level twin of
    dedup_against_index. On a STREAMING ``new_docs`` the anti-join is
    stream-static and stateless, and the surviving (id, pos, line) rows
    are returned UN-reassembled (a per-doc reassembly aggregate would
    be unbounded state; reassemble per micro-batch in foreachBatch)."""
    lines = _segment(new_docs, text_col, id_col, sep)
    kept = lines.join(
        line_index.select("line").dropDuplicates(["line"]),
        on="line", how="left_anti",
    )
    if new_docs.isStreaming:
        return kept
    return _reassemble(kept, id_col, sep).withColumnRenamed("_text", "text")


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF (round-9): tf(d,t) ×
    rational idf (N+1)/(df_t+1) — like bm25_score, the classic log() is
    monotone in this ratio, so the keyword RANKING is identical while
    every score stays a product/quotient of exact integer-derived
    doubles (an ANSI-SQL oracle reproduces scores and ranks
    bit-for-bit; ln differs in the last ulp across engines). Ties break
    on token text. Returns (id, token, rank, score), rank 1 = top
    keyword.

    Scale shape: one explode + groupBy(id, token) for tf (map-side
    combine), token-keyed groupBy for df over the already-aggregated tf
    table, broadcast 1-row N, then a per-document ranked window —
    partitioned by doc id, never global."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("_n"))
    scored = (
        tf.join(dfreq, on="token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * ((F.col("_n") + 1.0) / (F.col("df") + 1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "rank", "score")
    )


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) adjacent-token pairs per document: posexplode + a
    per-doc lead() window (partitioned by doc id, bounded by doc
    length)."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w1"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    return toks.withColumn("w2", F.lead("w1").over(w)).filter(
        F.col("w2").isNotNull()
    )


def bigram_rarity(
    df: DataFrame,
    threshold: float = 1e-4,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Bigram language-model rarity signal (round-9): a Laplace-smoothed
    bigram model p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) scores every bigram
    of every document; a document's quality signal is its share of RARE
    bigrams (p < threshold) — high rare_ratio = atypical/garbled text
    relative to the model corpus (the decision the perplexity filters
    of C4/Gopher make). By default the model is SELF-trained on ``df``;
    pass ``train_df`` (round-10) to train the counts on a REFERENCE
    corpus instead — the standard quality-filter setup (score the crawl
    against a clean corpus' model). Under Laplace smoothing an unseen
    bigram scores 1/(c(w1)+V) and an unseen first word 1/V — no zero
    probabilities, no special-casing. Everything is counts and one
    rational per bigram — no ln/exp, so the oracle is bit-exact:
    perplexity proper is exp(-mean ln p), monotone DEcreasing in these
    probabilities, and the threshold count is the decision-relevant
    summary. Returns (id, n_bigrams, n_rare, rare_ratio, min_p): min/max
    of exactly-computed doubles and integer counts are reduction-order
    independent, unlike a sum of logs.

    Scale shape: posexplode + per-doc lead() window -> two token-keyed
    groupBys for the model counts (map-side combine) -> two joins back
    on (w1[,w2]) -> one groupBy(id). All shuffles key on tokens or doc
    ids; the model tables are |vocab|- and |bigram-vocab|-sized, tiny
    next to a 100 TB corpus scan."""
    big = _doc_bigrams(df, text_col, id_col)
    model = big if train_df is None else _doc_bigrams(train_df, text_col, id_col)
    c12 = model.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = model.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab = model.select(F.col("w1").alias("t")).unionByName(
        model.select(F.col("w2").alias("t"))
    )
    v = vocab.agg(F.count_distinct("t").alias("_v"))
    if train_df is None:
        # self-trained: every scored bigram exists in the model — inner
        # joins keep the plan identical to the round-9 formulation
        joined = big.join(c12, on=["w1", "w2"]).join(c1, on="w1")
    else:
        joined = (
            big.join(c12, on=["w1", "w2"], how="left")
            .join(c1, on="w1", how="left")
            .withColumn("c12", F.coalesce(F.col("c12"), F.lit(0)))
            .withColumn("c1", F.coalesce(F.col("c1"), F.lit(0)))
        )
    p = joined.join(F.broadcast(v)).withColumn(
        "p", (F.col("c12") + 1.0) / (F.col("c1") + F.col("_v") + 0.0)
    )
    return p.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("p") < threshold, 1).otherwise(0))
        .cast("long")
        .alias("n_rare"),
        (
            F.sum(F.when(F.col("p") < threshold, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("rare_ratio"),
        F.min("p").alias("min_p"),
    )


def encode_docs(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = -1,
) -> DataFrame:
    """Encode documents against a trained vocabulary (round-9): the
    apply side of build_vocab — every token maps to its vocab_id,
    out-of-vocabulary tokens to ``unk_id`` (the <unk> convention).
    Returns (id, ids, n_tokens, n_unk) with ``ids`` an array<long> in
    original token order — the tensor-ready encode step a pretraining
    pipeline runs after tokenizer training.

    Scale shape: posexplode -> ONE broadcastable join on token (the
    vocab is |V| rows — tiny; beyond broadcast it's a token-keyed
    shuffle join) -> one groupBy(id) reassembling order via the sorted
    (pos, id) collect — the dedup_lines reassembly shape, bounded by
    doc length."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    joined = toks.join(
        F.broadcast(vocab.select("token", "vocab_id")), on="token", how="left"
    ).select(
        F.col(id_col),
        "pos",
        F.coalesce(F.col("vocab_id"), F.lit(unk_id)).cast("long").alias("tid"),
    )
    enc = joined.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s.tid,
        ).alias("ids"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("tid") == unk_id, 1).otherwise(0))
        .cast("long")
        .alias("n_unk"),
    )
    # empty docs keep an empty encoding rather than vanishing
    return (
        df.select(id_col)
        .join(enc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("ids"), F.array().cast("array<long>")).alias("ids"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_unk"), F.lit(0)).cast("long").alias("n_unk"),
        )
    )
