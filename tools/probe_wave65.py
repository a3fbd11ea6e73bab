"""Wave 65: spread-target sensitivity for the docs family (guide §2.5/§2.2).

The quiet-window r16 baseline shows the spread pipelines ANTI-scaling at
sf0.1 — faster at 8 cores than 32 (topk_ngrams 0.24 vs 0.66 s) — because
`_rp(spread=True)` / `_spread_for_udf` round-robin a ~580 KB corpus to
defaultParallelism tasks: per-task work is ~15 ms, so scheduling dominates.

This probe times the affected headline queries at 32 cores with the spread
target forced to N in {32, 16, 8, 4} (MODIN_SPARK_SPREAD_TARGET override the
engine honors after this wave's change), interleaved min-of-K per target.

Usage: python tools/probe_wave65.py [sf_dir]  (runs one target per child
process — the spread cache and session are per-process).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "docs_topk_ngrams",
    "docs_paragraph_dedup",
    "docs_clean_corpus",
    "docs_decontaminate",
    "docs_minhash_dedup",
    "docs_langid_quality",
    "docs_fingerprint",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import __spark_entry__ as entry
from modin_spark.session import get_spark
spark = get_spark()
qs = entry.queries()
sf = %(sf)r
# warm scan + python workers once
spark.read.parquet(f"{sf}/documents.parquet").count()
from pyspark.sql import functions as F
_w = F.pandas_udf(lambda s: s, "long")
spark.range(100000, numPartitions=32).select(_w("id")).count()
out = {}
for name in %(queries)r:
    runs = []
    for _ in range(3):
        t0 = time.time()
        qs[name](spark, sf).count()
        runs.append(time.time() - t0)
    out[name] = round(min(runs), 3)
print("RESULT " + json.dumps(out))
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results = {}
    for target in ("32", "16", "8", "4"):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = "32"
        env["SPARK_GRAFT_SF_DIR"] = sf
        env["MODIN_SPARK_SPREAD_TARGET"] = target
        code = CHILD % {"repo": REPO, "sf": sf, "queries": QUERIES}
        p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, env=env)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"target={target} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            continue
        results[target] = json.loads(line[-1][len("RESULT "):])
        print(f"target={target} " + json.dumps(results[target]))
    if len(results) > 1:
        print(f"\n{'query':28s} " + " ".join(f"{t:>7s}" for t in results))
        for q in QUERIES:
            print(f"{q:28s} " + " ".join(f"{results[t].get(q, -1):7.3f}" for t in results))


if __name__ == "__main__":
    main()
