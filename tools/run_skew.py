"""Run the adversarial-skew rung and freeze BASELINE_LOCAL_skew.json.

1. Builds .localdata/skew via tools/make_skew.py if absent.
2. Runs the full bench.py headline set against the skew data (same volume
   as sf0.1, skewed keys) and compares every query to its uniform-rung
   minimum (BASELINE_LOCAL_r07.json); queries >3x uniform are flagged.
3. Proves the minhash hot-bucket cap end-to-end on the planted 2500-doc
   boilerplate mega-cluster (5x the 500-doc cap used here):
   - counts over-cap LSH buckets (expect one 2500-id bucket per band),
   - runs the capped pipeline and asserts the mega-cluster expanded as a
     STAR (exactly m-1 pairs inside it, all anchored at the min id) rather
     than all-pairs,
   - asserts the full dedup still collapses the mega-cluster to ONE
     surviving document (the guard must not skip deduping the docs that
     need it most),
   - records the pair volume the star avoided (m*(m-1)/2 - (m-1) per band).

Usage: python tools/run_skew.py        (writes BASELINE_LOCAL_skew.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKEW = os.path.join(REPO, ".localdata", "skew")
CAP = 500
MEGA = 2500

sys.path.insert(0, REPO)


def main() -> None:
    if not os.path.exists(os.path.join(SKEW, "lineitem.parquet")):
        subprocess.run([sys.executable, os.path.join(REPO, "tools", "make_skew.py")], check=True)

    # -- bench the headline set on skew data (separate process: bench.py
    # owns its session lifecycle and warmup protocol)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SKEW)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    bench = json.loads(out.stdout.strip().splitlines()[-1])

    with open(os.path.join(REPO, "BASELINE_LOCAL_r07.json")) as f:
        uniform = json.load(f)["queries"]

    ratios, flagged = {}, []
    for q, t in bench["queries"].items():
        u = uniform.get(q)
        if u and u > 0 and t > 0:
            r = round(t / u, 2)
            ratios[q] = r
            # flag only ratios that are both large AND absolutely material
            # (a 0.1s->0.4s query is timer noise, not skew)
            if r > 3.0 and t > 0.5:
                flagged.append(q)

    # -- mega-cluster cap proof (same process, one session)
    from modin_spark.session import get_spark
    from modin_spark.operators.dedup import minhash_candidate_pairs, _band_rows, text_minhash_md5
    from pyspark.sql import functions as F

    spark = get_spark()
    docs = spark.read.parquet(os.path.join(SKEW, "documents.parquet"))

    # bucket-size census (no pair expansion): how many buckets exceed CAP?
    sigs = docs.select("doc_id", text_minhash_md5(F.col("text"), 5, 128).alias("__sig__"))
    banded = _band_rows(sigs, "doc_id", "__sig__", 32, 4, by_value=True)
    census = (
        banded.groupBy("__band__", "__bucket__").count()
        .agg(
            F.sum(F.when(F.col("count") > CAP, 1).otherwise(0)).alias("over_cap"),
            F.max("count").alias("max_bucket"),
            F.sum(
                F.when(F.col("count") > CAP, F.col("count") * (F.col("count") - 1) / 2)
                .otherwise(0)
            ).alias("pairs_avoided"),
        )
        .collect()[0]
    )

    t0 = time.time()
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", max_bucket_size=CAP, base_hash="md5"
    )
    mega = pairs.where((F.col("id_a") < MEGA) & (F.col("id_b") < MEGA))
    in_mega = mega.count()
    star_anchored = mega.where(F.col("id_a") == 0).count()
    n_pairs = pairs.count()
    capped_wall = round(time.time() - t0, 2)

    # end-to-end: the star pairs must still collapse the mega-cluster to ONE
    # surviving document through keep-min
    from modin_spark.operators.dedup import minhash_lsh_dedup

    survivors_in_mega = (
        minhash_lsh_dedup(docs, threshold=0.8, base_hash="md5", max_bucket_size=CAP)
        .where(F.col("doc_id") < MEGA)
        .count()
    )

    proof = {
        "cap": CAP,
        "mega_cluster_size": MEGA,
        "over_cap_buckets": int(census["over_cap"]),
        "max_bucket": int(census["max_bucket"]),
        "pairs_avoided_by_star": int(census["pairs_avoided"]) - 32 * (MEGA - 1),
        "capped_pairs_total": int(n_pairs),
        "star_pairs_within_mega_cluster": int(in_mega),
        "mega_cluster_survivors_after_dedup": int(survivors_in_mega),
        "capped_wall_sec": capped_wall,
    }
    assert proof["over_cap_buckets"] >= 32, proof  # the mega-bucket, every band
    # star expansion: exactly m-1 distinct pairs, every one anchored at the
    # cluster's min id — not the m(m-1)/2 all-pairs blowup
    assert proof["star_pairs_within_mega_cluster"] == MEGA - 1, proof
    assert star_anchored == MEGA - 1, (star_anchored, proof)
    assert proof["mega_cluster_survivors_after_dedup"] == 1, proof

    result = {
        **bench,
        "rung": "skew (sf0.1-volume, zipfian/hot keys; tools/make_skew.py)",
        "uniform_baseline": "BASELINE_LOCAL_r07.json",
        "ratios_vs_uniform": ratios,
        "flagged_over_3x": flagged,
        "bucket_cap_proof": proof,
    }
    path = os.path.join(REPO, "BASELINE_LOCAL_skew.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"flagged_over_3x": flagged, "bucket_cap_proof": proof}))
    print(f"written {path}")


if __name__ == "__main__":
    main()
