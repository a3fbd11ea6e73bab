"""Streaming resample — the reference has NO streaming subsystem (modin is
batch-only; SURVEY.md §2.3 resample notes). Net-new: the same tumbling-window
aggregation surface as modin_spark.pandas.resample, over Structured
Streaming, with watermark-based late-data handling and session windows.

Usage (batch parquet as a bounded stream for tests):

    q = stream_resample(spark, schema, path, ts_col="ts", rule="5min",
                        aggs={"value": "sum"}, watermark="10 minutes")
    q.processAllAvailable(); spark.sql("select * from stream_out")
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from modin_spark.core.compiler import agg_expr
from modin_spark.pandas.resample import rule_to_duration


def _ltz_event_time(df, ts_col: str):
    """Watermarks require TIMESTAMP (LTZ). Sources whose event-time column is
    TIMESTAMP_NTZ are cast in place — exact under the session's fixed UTC
    timezone."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_resample(
    spark: SparkSession,
    schema,
    path: str,
    ts_col: str,
    rule: str,
    aggs: dict[str, str],
    watermark: str = "10 minutes",
    extra_keys: list[str] | None = None,
    query_name: str = "stream_out",
    output_mode: str = "append",
):
    """Tumbling-window streaming aggregation ≙ resample(rule).agg(aggs).

    Watermark bounds state: rows later than `watermark` behind the max event
    time are dropped and their windows finalized — this is what makes the
    operator runnable indefinitely at scale (state is O(open windows), not
    O(stream))."""
    dur = rule_to_duration(rule)
    src = _ltz_event_time(spark.readStream.schema(schema).parquet(path), ts_col)
    keys = [F.window(F.col(ts_col), dur).alias("__win__")] + [F.col(k) for k in (extra_keys or [])]
    exprs = [agg_expr(fn, F.col(col)).alias(f"{col}_{fn}") for col, fn in aggs.items()]
    agged = (
        src.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*exprs)
        .select(F.col("__win__.start").alias("window_start"), *[F.col(c) for c in [k for k in (extra_keys or [])]],
                *[F.col(f"{col}_{fn}") for col, fn in aggs.items()])
    )
    return (
        agged.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_session_windows(
    spark: SparkSession,
    schema,
    path: str,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    query_name: str = "session_out",
):
    """Sessionization via F.session_window — state-bounded by watermark."""
    src = _ltz_event_time(spark.readStream.schema(schema).parquet(path), ts_col)
    agged = (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("__sess__"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("__sess__.start").alias("session_start"),
            F.col("__sess__.end").alias("session_end"),
            F.col(key_col),
            F.col("n_events"),
        )
    )
    return agged.writeStream.outputMode("append").format("memory").queryName(query_name).start()


def stream_dedup(
    spark: SparkSession,
    schema,
    path: str,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
    query_name: str = "dedup_out",
):
    """Streaming exact dedup — the streaming face of operators.dedup.exact_dedup.

    ``dropDuplicatesWithinWatermark`` keys state by ``key_cols`` and expires
    entries once the watermark passes them, so state is O(keys seen within the
    watermark horizon), not O(stream) — the property that lets a dedup stage
    run forever over a 100 TB/day feed. Exactly-once within the horizon;
    duplicates farther apart than the watermark are deliberately out of
    contract (batch exact_dedup covers reprocessing)."""
    src = _ltz_event_time(spark.readStream.schema(schema).parquet(path), ts_col)
    deduped = src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    return deduped.writeStream.outputMode("append").format("memory").queryName(query_name).start()
