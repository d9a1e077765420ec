"""Stage-level profile of dedup_ngram_jaccard (VERDICT r16 #2 prep):
where does the gate's time actually go — the shingle cache fill, the
inverted-index self-join, the pair aggregation, or the size joins?
And is the pair aggregation actually SKEWED at sf0.1 (the verdict's
salting hypothesis), given SCALE.md measured max df = 25?

Methodology: bench-style — untimed warmup, then interleaved reps of
each stage with the noop sink, report min/median. Run on a probed
band; compare minima.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from g4s_spark.session import get_spark  # noqa: E402
from g4s_spark.sources import load_table  # noqa: E402
from g4s_spark.functions import dedup as D  # noqa: E402
from g4s_spark.functions.dedup import shingle_docs  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    print(f"{label}: min {min(ts):.3f}  med {sorted(ts)[len(ts)//2]:.3f}  {ts}")
    return min(ts)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp_ngram")
    spark.range(1000).count()
    docs = load_table(spark, sf_dir, "documents")

    # ---- the gate as shipped (warmup + timed) ----
    spark.sparkContext.setJobDescription("ngram: gate warmup")
    noop(D.ngram_jaccard_pairs(docs, threshold=0.3, materialize=True))

    spark.sparkContext.setJobDescription("ngram: gate")
    timed("gate(materialize=True)", lambda: noop(
        D.ngram_jaccard_pairs(docs, threshold=0.3, materialize=True)))

    # ---- stage split ----
    def fill_only():
        sh = shingle_docs(docs, "text", "doc_id", 3).cache()
        try:
            sh.count()
        finally:
            sh.unpersist()

    spark.sparkContext.setJobDescription("ngram: cache fill only")
    timed("shingle cache fill", fill_only, reps=5)

    # pre-filled cache shared by the pair stages below
    sh = shingle_docs(docs, "text", "doc_id", 3).cache()
    n_sh = sh.count()
    print(f"shingle rows (distinct doc,shingle): {n_sh}")

    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    spark.sparkContext.setJobDescription("ngram: pair stage from cache")
    timed("pair join+agg (cached sh)", lambda: noop(inter))

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza")), on="a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb")), on="b")
        .withColumn("jaccard", F.col("n_common") / (F.col("sza") + F.col("szb") - F.col("n_common")))
        .filter(F.col("jaccard") >= 0.3)
    )
    spark.sparkContext.setJobDescription("ngram: full tail from cache")
    timed("pairs+sizes+filter (cached sh)", lambda: noop(out))

    # candidate-row count + per-shingle df profile (skew check)
    n_cand = a.join(b, on="shingle").filter(F.col("a") < F.col("b")).count()
    dfp = sh.groupBy("shingle").count()
    prof = dfp.agg(
        F.max("count").alias("max_df"),
        F.expr("percentile_approx(count, 0.5)").alias("p50"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pair_rows"),
    ).collect()[0]
    print(f"candidate rows (a<b): {n_cand}")
    print(f"df profile: {prof.asDict()}")
    sh.unpersist()


if __name__ == "__main__":
    main()
