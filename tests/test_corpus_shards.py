"""Token-balanced corpus sharding: layout invariants + writer roundtrip."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


def test_shard_layout_and_writer(spark):
    from modin_spark.operators.corpus import assign_shards, write_corpus_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = F.size(F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != ""))
    t = docs.select("doc_id", toks.cast("long").alias("tokens"), "text").where(F.col("tokens") > 0)
    target = 2048
    sh = assign_shards(t, "doc_id", "tokens", target)

    stats = (
        sh.groupBy("shard")
        .agg(F.sum("tokens").alias("tok"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .orderBy("shard")
        .collect()
    )
    max_doc = sh.agg(F.max("tokens")).collect()[0][0]
    # every shard except the last holds >= target - max_doc + 1 tokens and
    # starts within one doc of the boundary; id spans never interleave
    for i, r in enumerate(stats):
        if i < len(stats) - 1:
            assert r["tok"] > target - max_doc, (i, r["tok"])
            assert r["tok"] < target + max_doc, (i, r["tok"])
            assert r["hi"] < stats[i + 1]["lo"]

    d = tempfile.mkdtemp()
    try:
        write_corpus_shards(t, f"{d}/shards", "doc_id", "tokens", target)
        back = spark.read.parquet(f"{d}/shards")
        assert back.count() == t.count()
        # shard dirs round-trip the assignment exactly
        got = {(r["shard"], r["n"]) for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
        exp = {(r["shard"], r["n"]) for r in sh.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got == exp
    finally:
        shutil.rmtree(d, ignore_errors=True)
