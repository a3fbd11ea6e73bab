"""Run the sf10 TEXT rung and freeze BASELINE_LOCAL_sf10.json.

Question (VERDICT r7 item 7): clean_corpus at the sf1 rung ran 7.6x at 10x
data — approaching linear, as expected for scan-bound work.  Does the trend
hold one rung up for the corpus-scan family, and does MinHash candidate
volume stay LINEAR in corpus size (the sf1 generator's rotation bug showed
how easily shingle-preserving scale-up goes quadratic)?

Protocol:
1. Builds .localdata/sf1 (10x control) and .localdata/sf10_text (100x,
   documents only) if absent.
2. Times the 11 documents-only queries at both rungs (2 runs, min — same
   ASV protocol as bench.py) and records the sf10/sf1 ratio; data is 10x,
   so a scan-bound query should land at <= ~10x with sublinearity from
   fixed per-query overheads.
3. Counts MinHash LSH candidate pairs at sf0.1 / sf1 / sf10 — linear growth
   (~10x per rung) is the pass condition; quadratic growth means cross-copy
   shingle collisions (the rotation bug) or a real clique blowup.

Usage: python tools/run_sf10.py        (writes BASELINE_LOCAL_sf10.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".localdata", "sf1")
SF10 = os.path.join(REPO, ".localdata", "sf10_text")

TEXT_QUERIES = [
    "docs_token_stats",
    "docs_fingerprint",
    "docs_langid_quality",
    "docs_pii_scrub",
    "docs_repetition",
    "docs_chunk_windows",
    "docs_clean_corpus",
    "docs_topk_ngrams",
    "docs_decontaminate",
    "docs_paragraph_dedup",
    "docs_minhash_dedup",
]

sys.path.insert(0, REPO)


def main() -> None:
    for path, script in ((SF1, "make_sf1.py"), (SF10, "make_sf10_text.py")):
        if not os.path.exists(os.path.join(path, "documents.parquet")):
            subprocess.run([sys.executable, os.path.join(REPO, "tools", script)], check=True)

    import __spark_entry__ as entry
    from modin_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()

    # warm readers + Arrow worker pools outside timing (bench.py protocol)
    from pyspark.sql import functions as F

    ncpu = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(os.path.join(SF10, "documents.parquet")).count()
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100_000, numPartitions=ncpu).select(_warm("id")).count()
    spark.range(100_000, numPartitions=ncpu).mapInPandas(lambda it: it, "id long").count()

    def run(sf_dir: str) -> dict[str, float]:
        out = {}
        for name in TEXT_QUERIES:
            runs = []
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                runs.append(time.time() - t0)
            out[name] = round(min(runs), 3)
            print(f"  {name} @ {os.path.basename(sf_dir)}: {out[name]}s", file=sys.stderr)
        return out

    t1 = run(SF1)
    t10 = run(SF10)
    ratios = {q: round(t10[q] / t1[q], 2) for q in TEXT_QUERIES if t1[q] > 0}

    # candidate-pair linearity census at all three rungs
    from modin_spark.operators.dedup import minhash_candidate_pairs

    pair_counts = {}
    for tag, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", SF1), ("sf10", SF10)):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        pair_counts[tag] = minhash_candidate_pairs(
            docs, "doc_id", "text", base_hash="md5"
        ).count()

    result = {
        "rung": "sf10 text-only (100x sf0.1 documents; tools/make_sf10_text.py)",
        "control": "sf1 (tools/make_sf1.py)",
        "sf1_sec": t1,
        "sf10_sec": t10,
        "ratio_sf10_vs_sf1": ratios,
        "max_ratio": max(ratios.values()),
        "median_ratio": sorted(ratios.values())[len(ratios) // 2],
        "minhash_candidate_pairs": pair_counts,
        "pair_growth_sf1_vs_sf01": round(pair_counts["sf1"] / max(pair_counts["sf0.1"], 1), 2),
        "pair_growth_sf10_vs_sf1": round(pair_counts["sf10"] / max(pair_counts["sf1"], 1), 2),
    }
    path = os.path.join(REPO, "BASELINE_LOCAL_sf10.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(f"written {path}")


if __name__ == "__main__":
    main()
