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


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
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
