"""Streaming corpus ingest: the Structured-Streaming face of the batch
corpus-cleaning pipeline (operators.text + operators.dedup.exact path).

The same Catalyst expressions that power the batch operators (lang_id,
quality_score, token_count, fingerprint — all pure projections) are applied
unchanged to the streaming DataFrame; dedup state is bounded by the
watermark horizon via ``dropDuplicatesWithinWatermark``; the per-language
rollup is a watermarked tumbling-window aggregate. State is O(fingerprints
within horizon) + O(open windows), never O(stream) — the property that lets
an ingest stage run forever against a firehose.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def stream_corpus_clean(
    spark: SparkSession,
    schema,
    path: str,
    ts_col: str = "ts",
    text_col: str = "text",
    min_quality: float = 0.3,
    watermark: str = "10 minutes",
    window: str = "1 hour",
    query_name: str = "corpus_clean_out",
):
    """Quality-filter -> fingerprint-dedup -> per-(window, lang) stats over a
    streaming document feed. Returns the started query; results land in the
    in-memory table ``query_name`` as
    (window_start, lang_pred, n_docs, n_tokens).

    Dedup contract matches streaming/resample.stream_dedup: exactly-once
    within the watermark horizon; cross-horizon reprocessing belongs to the
    batch pipeline (``_docs_clean_corpus``).
    """
    from modin_spark.operators.text import fingerprint, lang_id, quality_score, token_count
    from modin_spark.streaming.resample import _ltz_event_time

    src = _ltz_event_time(spark.readStream.schema(schema).parquet(path), ts_col)
    t = F.col(text_col)
    enriched = src.select(
        F.col(ts_col),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        token_count(t, "whitespace").alias("n_tokens"),
        fingerprint(t).alias("fp"),
    )
    filtered = enriched.where(F.col("quality") >= min_quality)
    deduped = filtered.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])
    agged = (
        deduped.groupBy(F.window(F.col(ts_col), window), F.col("lang_pred"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(F.col("window.start").alias("window_start"), "lang_pred", "n_docs", "n_tokens")
    )
    return agged.writeStream.outputMode("append").format("memory").queryName(query_name).start()
