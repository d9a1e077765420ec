"""A/B: dedup_simhash two-exchange shape (map-side-deduped (id,tok)
shuffle + tiny vote shuffle) vs a single-exchange variant that
repartitions the exploded tokens on doc_id up front so BOTH the
distinct and the vote aggregation reuse one exchange (the subset rule:
HashPartitioning(id) satisfies ClusteredDistribution([id, tok])).

Trade being measured: one fewer exchange/stage barrier vs shuffling the
RAW exploded token stream (no map-side partial dedup before the wire).

Results are asserted identical before timing. Usage:
    python scripts/exp_simhash.py [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def simhash_single_exchange(df, text_col="text", id_col="doc_id", bits=16):
    from g4s_spark.functions.text import tokens

    tok = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .repartition(id_col)
        .dropDuplicates([id_col, "tok"])
        .select(
            id_col,
            F.conv(F.substring(F.md5(F.col("tok")), 1, bits // 4), 16, 10)
            .cast("long").alias("hv"),
        )
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftright(F.col("hv"), bits - 1 - p).bitwiseAND(F.lit(1))).alias(f"s{p}")
        for p in range(bits)
    ]
    votes = tok.groupBy(id_col).agg(*aggs)
    fingerprint = None
    for p in range(bits):
        term = F.when(
            F.lit(2) * F.col(f"s{p}") - F.col("n") > 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select(id_col, fingerprint.alias("simhash"))


def main():
    reps = 4
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])

    from g4s_spark.functions import dedup as D
    from g4s_spark.session import get_spark
    from g4s_spark.sources import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp_simhash")
    spark.range(1000).count()
    docs = load_table(spark, sf_dir, "documents")

    # equivalence gate first — bit-identical fingerprints or we stop
    base = {tuple(r) for r in D.simhash(docs).collect()}
    var = {tuple(r) for r in simhash_single_exchange(docs).collect()}
    assert base == var, f"results differ: {len(base ^ var)} rows"
    print(f"# results identical ({len(base)} rows)", file=sys.stderr)

    builders = {
        "baseline_2x": lambda: D.simhash(docs),
        "single_exch": lambda: simhash_single_exchange(docs),
    }
    samples = {k: [] for k in builders}
    for k, b in builders.items():  # warmup
        b().write.mode("overwrite").format("noop").save()
    for r in range(reps):
        for k, b in builders.items():  # interleaved
            spark.sparkContext.setJobDescription(f"{k} [{r}]")
            t0 = time.time()
            b().write.mode("overwrite").format("noop").save()
            samples[k].append(round(time.time() - t0, 3))
    for k, ts in samples.items():
        print(f"{k}: min {min(ts):.3f}  samples {ts}")


if __name__ == "__main__":
    main()
