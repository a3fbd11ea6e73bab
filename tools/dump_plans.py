"""Dump .explain("formatted") for headline queries to plans/r16/<q>_<tag>.txt
without timing anything (plan generation is host-noise-insensitive).

Usage: python tools/dump_plans.py [--tag after] [query ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="after")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry
    from modin_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    names = args.queries or bench.HEADLINE
    plans_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, "done", file=sys.stderr)


if __name__ == "__main__":
    main()
