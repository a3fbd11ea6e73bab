"""Resample — time-series tumbling-window groupby
(reference surface: /root/reference/modin/pandas/resample.py:36).

Batch implementation: ``F.window(ts, freq)`` tumbling windows + hash agg —
one shuffle, identical plan shape to any Spark windowed aggregation; the same
expression works under Structured Streaming (see modin_spark.streaming).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from modin_spark.core import compiler as qc
from modin_spark.core.frame import ORDER_COL, SparkFrame, fresh_names

_FREQ = {
    "s": "second", "S": "second", "sec": "second",
    "min": "minute", "T": "minute", "t": "minute",
    "h": "hour", "H": "hour",
    "d": "day", "D": "day",
    "w": "week", "W": "week",
}


def rule_to_duration(rule: str) -> str:
    m = re.fullmatch(r"(\d*)\s*([A-Za-z]+)", rule)
    if not m:
        raise ValueError(f"cannot parse resample rule {rule!r}")
    n = int(m.group(1) or 1)
    unit = m.group(2)
    if unit not in _FREQ:
        raise NotImplementedError(f"resample freq {unit!r}")
    return f"{n} {_FREQ[unit]}{'s' if n != 1 else ''}"


class Resampler:
    def __init__(self, df, rule: str, on=None):
        self._df = df
        self._rule = rule
        self._on = on

    def _agg(self, name: str, numeric_only=True):
        from modin_spark.pandas.dataframe import DataFrame

        fr = self._df._frame
        if name in ("first", "last"):
            fr = fr.ensure_order()
        if self._on is not None:
            ts_phys = fr.data_cols[fr.positions_of([self._on])[0]]
        elif fr.index_cols:
            ts_phys = fr.index_cols[0]
        else:
            raise ValueError("resample needs on= or a datetime index")
        dur = rule_to_duration(self._rule)
        bucket = F.window(F.col(ts_phys), dur)["start"]

        positions = [
            i
            for i in range(len(fr.columns))
            if fr.data_cols[i] != ts_phys
            and (not numeric_only or fr.dtype_of(i).startswith(("int", "float")))
        ]
        out_phys = fresh_names(len(positions) + 1)
        key_p, val_ps = out_phys[0], out_phys[1:]
        aggs = [qc.agg_expr(name, F.col(fr.data_cols[i])).alias(p) for i, p in zip(positions, val_ps)]
        agged = fr.sdf.groupBy(bucket.alias(key_p)).agg(*aggs)
        agged = agged.withColumn(ORDER_COL, F.col(key_p))
        labels = [fr.columns[i] for i in positions]
        on_name = self._on if self._on is not None else fr.index_names[0]
        out = SparkFrame(agged, pd.Index(labels), val_ps, [key_p], [on_name])
        return DataFrame(_frame=out)

    def sum(self):
        return self._agg("sum")

    def mean(self):
        return self._agg("mean")

    def count(self):
        return self._agg("count")

    def min(self):
        return self._agg("min")

    def max(self):
        return self._agg("max")

    def std(self):
        return self._agg("std")

    def var(self):
        return self._agg("var")

    def median(self):
        return self._agg("median")

    def first(self):
        return self._agg("first")

    def last(self):
        return self._agg("last")

    def nunique(self):
        return self._agg("nunique", numeric_only=False)

    def size(self):
        from modin_spark.pandas.series import Series

        out = self._agg("size", numeric_only=True)
        fr = out._frame
        one = fr.select_positions([0]) if fr.columns.size else fr
        return Series._from_frame(one.set_labels(["size"])) if fr.columns.size else None

    def agg(self, spec):
        if isinstance(spec, str):
            return self._agg(spec)
        raise NotImplementedError

    def asfreq(self):
        """Value at each period boundary, with gaps as NULL rows — a
        generated timeline (F.sequence over the observed min/max, driver sees
        only 2 scalars) left-joined to the per-bucket last values."""
        return self._timeline_fill(fill=None)

    def ffill(self, how: str = "last"):
        """asfreq + forward-fill over the gap rows (blocked two-pass ffill —
        no global window)."""
        return self._timeline_fill(fill="ffill", how=how)

    def bfill(self, how: str = "last"):
        return self._timeline_fill(fill="bfill", how=how)

    def _timeline_fill(self, fill, how: str = "last"):
        from modin_spark.core import windows as win
        from modin_spark.pandas.dataframe import DataFrame

        base = self._agg(how)  # one row per observed bucket
        fr = base._frame
        key = fr.index_cols[0]
        dur = rule_to_duration(self._rule)
        bounds = fr.sdf.agg(F.min(key).alias("mn"), F.max(key).alias("mx")).collect()[0]
        timeline = fr.spark.range(1).select(
            F.explode(
                F.sequence(F.lit(bounds["mn"]), F.lit(bounds["mx"]), F.expr(f"interval {dur}"))
            ).alias("__ts__")
        )
        joined = timeline.join(fr.sdf, timeline["__ts__"] == fr.sdf[key], "left").drop(key, ORDER_COL)
        joined = joined.withColumn(key, F.col("__ts__")).withColumn(ORDER_COL, F.col("__ts__")).drop("__ts__")
        out = SparkFrame(joined, fr.columns, fr.data_cols, [key], list(fr.index_names))
        if fill == "ffill":
            filled = win.ffill(out, list(range(len(out.columns))))
            out = SparkFrame(
                filled.sdf, out.columns, filled.data_cols, [key], list(out.index_names)
            )
        elif fill == "bfill":
            filled = win.bfill(out, list(range(len(out.columns))))
            out = SparkFrame(
                filled.sdf, out.columns, filled.data_cols, [key], list(out.index_names)
            )
        return DataFrame(_frame=out)

    def ohlc(self):
        from modin_spark.pandas.dataframe import DataFrame

        fr = self._df._frame.ensure_order()
        ts_phys = fr.data_cols[fr.positions_of([self._on])[0]] if self._on else fr.index_cols[0]
        dur = rule_to_duration(self._rule)
        bucket = F.window(F.col(ts_phys), dur)["start"]
        positions = [i for i in range(len(fr.columns)) if fr.data_cols[i] != ts_phys and fr.dtype_of(i).startswith(("int", "float"))]
        out_phys = fresh_names(4 * len(positions) + 1)
        key_p = out_phys[0]
        aggs, labels = [], []
        k = 1
        for i in positions:
            c = F.col(fr.data_cols[i])
            for sub, fn in (("open", "first"), ("high", "max"), ("low", "min"), ("close", "last")):
                aggs.append(qc.agg_expr(fn, c).alias(out_phys[k]))
                labels.append((fr.columns[i], sub) if len(positions) > 1 else sub)
                k += 1
        agged = fr.sdf.groupBy(bucket.alias(key_p)).agg(*aggs).withColumn(ORDER_COL, F.col(key_p))
        on_name = self._on if self._on is not None else fr.index_names[0]
        out = SparkFrame(agged, pd.Index(labels), out_phys[1:], [key_p], [on_name])
        return DataFrame(_frame=out)
