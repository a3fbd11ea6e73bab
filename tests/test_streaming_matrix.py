"""Streaming coverage matrix (r8): which registry operators run UNCHANGED
under Structured Streaming.

Classification (recorded in COVERAGE.md §Streaming):
- STATELESS (map-only expression trees / arrow-batch UDFs): the same
  df->df function works on a readStream frame with an append sink —
  chunk_documents (proven in test_streaming.py), pii_scrub,
  repetition_stats, text_stats, classifier_score, hash_frac_filter /
  stratified_sample, lang_id / quality_score / token_count / fingerprint,
  minhash/simhash signature expressions, attach_image_meta,
  image/audio_features, resize_images, sample_frames.
- STATEFUL-WITH-WATERMARK: resample / session windows / in-watermark dedup
  have dedicated wrappers in modin_spark.streaming (tested there).
- BATCH-ONLY (global agg/sort/iteration): topk_ngrams, pack_sequences,
  assign_shards, domain_cap, mixture_sample (needs corpus-wide token
  counts), decontaminate (distinct), the dedup pipelines past the
  signature step, similarity top-k, kmeans/ivf, connected components.

These tests prove three more rows of the stateless list differentially:
streamed output == batch output over the same files.
"""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _stream_vs_batch(spark, tmp_path, src_df, op, name, key):
    src_dir = str(tmp_path / name)
    src_df.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = op(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName(f"t_{name}")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(f"select * from t_{name}").toPandas()
    finally:
        q.stop()
    exp = op(spark.read.parquet(src_dir)).toPandas()
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    exp = exp.sort_values(key).reset_index(drop=True)[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stream_pii_scrub_and_stats(spark, tmp_path):
    """pii_scrub + repetition_stats + text_stats are pure expression trees:
    one streamed pass == the batch pass."""
    from modin_spark.operators.text import pii_scrub, repetition_stats, text_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    def op(df):
        return text_stats(repetition_stats(pii_scrub(df)))

    _stream_vs_batch(spark, tmp_path, docs, op, "pii_stats", ["doc_id"])


def test_stream_stratified_sample(spark, tmp_path):
    """hash_frac_filter-based stratified sampling is a per-row deterministic
    filter -> identical sample streamed or batch."""
    from modin_spark.operators.corpus import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )

    def op(df):
        return stratified_sample(
            df, "lang", {"en": 0.5, "de": 0.25}, "doc_id", default_frac=0.1
        )

    _stream_vs_batch(spark, tmp_path, docs, op, "strat", ["doc_id"])


def test_stream_minhash_signatures(spark, tmp_path):
    """The minhash SIGNATURE step (the scan-side 100-TB-heavy part of the
    dedup pipeline) is a per-row pandas_udf: it streams unchanged. Only the
    banded self-join/grouping downstream is batch (or watermarked)."""
    from modin_spark.operators.dedup import text_minhash_md5
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").limit(200)

    def op(df):
        return df.select(
            "doc_id", F.hex(text_minhash_md5(F.col("text"), 5, 32)).alias("sig")
        )

    _stream_vs_batch(spark, tmp_path, docs, op, "minhash_sig", ["doc_id"])


def test_stream_image_features(spark, tmp_path):
    """Multimodal feature extraction (mapInPandas over binary payloads)
    streams unchanged — the ingest-side shape of a media pipeline."""
    from modin_spark.operators.multimodal import make_synthetic_media, image_features
    from pyspark.sql import functions as F

    media = make_synthetic_media(spark, n=40, kind="png").select("media_id", "payload")

    def op(df):
        return image_features(df, "payload", dim=16).select(
            "media_id", F.round(F.element_at("features", 1), 6).alias("f0")
        )

    _stream_vs_batch(spark, tmp_path, media, op, "imgfeat", ["media_id"])
