"""Dump .explain("formatted") for named queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
       (default queries: the full bench HEADLINE set)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from g4s_spark.session import get_spark

    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join("/root/repo/plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
