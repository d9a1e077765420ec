"""Print the formatted physical plans of the most expensive bench
queries — the reproducible form of the 100 TB plan audit in SCALE.md.

Usage: python scripts/plan_audit.py [query ...]   (default: the heavy set)

Read the output for:
- PushedFilters / ReadSchema on every parquet scan (pushdown + pruning),
- BroadcastHashJoin on dimension/scalar sides, SortMergeJoin only on
  fact-fact keys, no CartesianProduct outside the labeled baselines,
- Exchange count: one shuffle per groupBy/join key change, none repeated,
- WholeStageCodegen spans covering the column expressions.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

HEAVY = [
    "mxm_any_pair", "mxm_plus_times", "graph_pagerank",
    "dedup_ngram_jaccard", "ann_lsh_topk", "rel_q5_local_volume",
    "rel_q9_profit", "text_bm25",
    # round-11 debuts: the nearest-direction asof must show ONE
    # Exchange feeding two Sort+Window passes; neighbor_agg one
    # join + one HashAggregate pair per hop; dedup_canonical no
    # window over cluster members (aggregates only)
    "events_asof_nearest", "graph_neighbor_agg", "dedup_canonical",
]


def main():
    import __spark_entry__ as entrymod
    from g4s_spark.session import get_spark

    names = sys.argv[1:] or HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan_audit")
    qs = entrymod.queries()
    for name in names:
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        qs[name](spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
