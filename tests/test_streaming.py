"""Structured Streaming resample/session windows over the events table
(net-new vs the batch-only reference)."""

import time

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _schema(spark):
    from modin_spark.pandas.io import _nano_ts_cols

    # events.parquet has ns timestamps; stream as the Spark-readable schema
    df = spark.read.option("mergeSchema", "false").parquet(f"{SF}/events.parquet") if not _nano_ts_cols(
        f"{SF}/events.parquet"
    ) else None
    return df


def test_stream_resample_matches_batch(spark, tmp_path):
    """Tumbling-window streaming agg == batch groupBy(window) on same data."""
    import modin_spark.pandas as mpd
    from modin_spark.streaming.resample import stream_resample
    from pyspark.sql import functions as F

    # write a Spark-readable (µs-timestamp) copy to stream from
    ev = mpd.read_parquet(f"{SF}/events.parquet").to_spark(ordered=False)
    src_dir = str(tmp_path / "events_us")
    ev.select("ts", "value").write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    q = stream_resample(
        spark, schema, src_dir, ts_col="ts", rule="1h", aggs={"value": "sum"},
        watermark="1 minute", query_name="t_resample", output_mode="complete",
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from t_resample").toPandas().sort_values("window_start").reset_index(drop=True)
    finally:
        q.stop()

    batch = (
        spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("value_sum"))
        .select(F.col("window.start").alias("window_start"), "value_sum")
        .toPandas().sort_values("window_start").reset_index(drop=True)
    )
    assert len(got) == len(batch)
    import numpy as np

    np.testing.assert_allclose(got["value_sum"].values, batch["value_sum"].values, rtol=1e-9)


def test_stream_session_windows(spark, tmp_path):
    import modin_spark.pandas as mpd
    from modin_spark.streaming.resample import stream_session_windows

    ev = mpd.read_parquet(f"{SF}/events.parquet").to_spark(ordered=False)
    src_dir = str(tmp_path / "events_sess")
    ev.select("ts", "user_id").write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    q = stream_session_windows(
        spark, schema, src_dir, ts_col="ts", key_col="user_id",
        gap="30 minutes", watermark="0 seconds", query_name="t_sess",
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from t_sess").toPandas()
    finally:
        q.stop()
    # sessions exist and end >= start
    assert (got["session_end"] >= got["session_start"]).all()


def test_stream_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState per-key running totals == batch groupBy agg
    after all micro-batches are processed."""
    import modin_spark.pandas as mpd
    from pyspark.sql import functions as F

    from modin_spark.streaming.stateful import stream_running_totals

    ev = mpd.read_parquet(f"{SF}/events.parquet").to_spark(ordered=False)
    src_dir = str(tmp_path / "events_state")
    ev.select("event_type", "value").write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    q = stream_running_totals(
        spark, schema, src_dir, key_col="event_type", value_col="value",
        query_name="t_stateful",
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql("select * from t_stateful").toPandas()
            .sort_values("running_count", ascending=False)
            .drop_duplicates("key")  # last update per key wins
            .set_index("key")
        )
        ref = (
            spark.read.parquet(src_dir)
            .groupBy("event_type")
            .agg(F.count("value").alias("cnt"), F.sum("value").alias("s"))
            .toPandas().set_index("event_type")
        )
        for k in ref.index:
            assert got.loc[k, "running_count"] == ref.loc[k, "cnt"], k
            assert abs(got.loc[k, "running_sum"] - ref.loc[k, "s"]) < 1e-6, k
    finally:
        q.stop()


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key; duplicates inside
    the watermark horizon are suppressed."""
    import modin_spark.pandas as mpd
    from modin_spark.streaming.resample import stream_dedup

    ev = mpd.read_parquet(f"{SF}/events.parquet").to_spark(ordered=False)
    base = ev.select("event_id", "ts", "value").limit(500)
    dup = base.limit(120)  # re-deliver 120 events (same event_id, same ts)
    src_dir = str(tmp_path / "events_dup")
    base.unionAll(dup).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    q = stream_dedup(
        spark, schema, src_dir, key_cols=["event_id"], ts_col="ts",
        watermark="365 days", query_name="t_dedup",
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from t_dedup").toPandas()
    finally:
        q.stop()
    assert len(got) == 500, len(got)
    assert got["event_id"].is_unique


def test_stream_corpus_clean_matches_batch(spark, tmp_path):
    """Streaming quality-filter + fingerprint-dedup + windowed per-lang
    stats == the same pipeline computed in batch over the same files."""
    from modin_spark.streaming.corpus import stream_corpus_clean
    from modin_spark.operators.text import fingerprint, lang_id, quality_score, token_count
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # synthetic event times: one doc per 90s starting at a fixed epoch;
    # duplicate the first 10 docs 30 minutes later (inside the horizon)
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    feed = docs.select(
        F.timestamp_seconds(F.unix_timestamp(base) + F.col("doc_id") * 90).alias("ts"), "text"
    )
    dups = docs.where("doc_id < 10").select(
        F.timestamp_seconds(F.unix_timestamp(base) + F.col("doc_id") * 90 + 1800).alias("ts"), "text"
    )
    src_dir = str(tmp_path / "doc_feed")
    feed.unionByName(dups).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    q = stream_corpus_clean(
        spark, schema, src_dir, ts_col="ts", min_quality=0.3,
        watermark="2 hours", window="1 hour", query_name="t_corpus_clean",
    )
    try:
        q.processAllAvailable()
        # append mode only emits closed windows; process a late tick to
        # advance the watermark past everything, then re-drain
        got = spark.sql("select * from t_corpus_clean").toPandas()
    finally:
        q.stop()

    t = F.col("text")
    batch = (
        spark.read.parquet(src_dir)
        .select("ts", lang_id(t).alias("lang_pred"), quality_score(t).alias("quality"),
                token_count(t, "whitespace").alias("n_tokens"), fingerprint(t).alias("fp"))
        .where(F.col("quality") >= 0.3)
        .dropDuplicates(["fp"])
        .groupBy(F.window("ts", "1 hour"), "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .select(F.col("window.start").alias("window_start"), "lang_pred", "n_docs", "n_tokens")
        .toPandas()
    )
    key = ["window_start", "lang_pred"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    # append-mode may hold back the final (unclosed) windows; every emitted
    # row must match batch exactly, and most windows must have been emitted
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got) and len(got) >= len(batch) * 0.5, (len(got), len(batch))
    assert (merged["n_docs_s"] == merged["n_docs_b"]).all()
    assert (merged["n_tokens_s"] == merged["n_tokens_b"]).all()


def test_stream_chunking_matches_batch(spark, tmp_path):
    """chunk_documents is a stateless map-only op, so the SAME expression
    tree runs unchanged under Structured Streaming (readStream -> chunk ->
    append sink): streamed chunks == batch chunks over the same files."""
    from modin_spark.operators.corpus import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    src_dir = str(tmp_path / "docs_feed")
    docs.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = spark.readStream.schema(schema).parquet(src_dir)
    chunked = chunk_documents(stream, "doc_id", "text", chunk_size=32, overlap=4)
    q = (
        chunked.writeStream.format("memory").queryName("t_chunks")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from t_chunks").toPandas()
    finally:
        q.stop()

    exp = chunk_documents(spark.read.parquet(src_dir), "doc_id", "text",
                          chunk_size=32, overlap=4).toPandas()
    key = ["doc_id", "chunk_id"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stream_near_dedup_matches_batch_screen(spark, tmp_path):
    """Streaming MinHash-LSH screen == the batch bucket-claim rule on the
    same static data (every doc's band buckets claimed in arrival order;
    kept iff it claimed all of them)."""
    import numpy as np
    from pyspark.sql import functions as F

    from modin_spark.operators.dedup import text_minhash
    from modin_spark.streaming.corpus import stream_near_dedup

    docs = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:01", "the quick brown fox jumps over the lazy dog again and again"),
            (2, "2024-01-01 00:00:02", "the quick brown fox jumps over the lazy dog again and again"),
            (3, "2024-01-01 00:00:03", "a completely different document about distributed query engines"),
            (4, "2024-01-01 00:00:04", "yet another unrelated text concerning window aggregation"),
            (5, "2024-01-01 00:00:05", "a completely different document about distributed query engines"),
            # sentinel far past the window end: advances the watermark so the
            # hour-0 window FINALIZES (append mode only emits closed windows)
            (99, "2024-01-01 02:30:00", "late watermark sentinel document entirely unlike the others"),
        ],
        "doc_id long, ts string, text string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src_dir = str(tmp_path / "docs_stream")
    docs.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    q = stream_near_dedup(spark, schema, src_dir, ts_col="ts", id_col="doc_id",
                          text_col="text", watermark="1 minute", window="1 hour",
                          query_name="t_near_dedup")
    try:
        q.processAllAvailable()
        got = sorted(spark.sql("select doc_id from t_near_dedup").toPandas()["doc_id"])
    finally:
        q.stop()

    # batch replay of the claim rule: first arrival per (band, bucket)
    bands, rpb = 32, 4
    sig = docs.select("doc_id", "ts", text_minhash(F.col("text"), k=5, num_perm=128).alias("__sig__"))
    banded = sig.select(
        "doc_id", "ts",
        F.posexplode(F.array(*[
            F.xxhash64(F.expr(f"substring(__sig__, {b * rpb * 8 + 1}, {rpb * 8})"))
            for b in range(bands)
        ])).alias("__band__", "__bucket__"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("__band__", "__bucket__").orderBy("ts")
    first = banded.withColumn("__rn__", F.row_number().over(w)).where(F.col("__rn__") == 1)
    counts = first.groupBy("doc_id").count().where(F.col("count") == bands)
    # only the FINALIZED hour-0 window is emitted; the sentinel stays pending
    want = sorted(r["doc_id"] for r in counts.collect() if r["doc_id"] != 99)
    # within ONE micro-batch the surviving claimant of a dup cluster is
    # arbitrary (dropDuplicates keeps an arbitrary first) — assert the
    # CLUSTER semantics: one survivor per near-dup cluster, singletons kept
    assert len(got) == len(want)
    assert len({1, 2} & set(got)) == 1  # exact-dup pair -> one survivor
    assert len({3, 5} & set(got)) == 1
    assert 4 in got
