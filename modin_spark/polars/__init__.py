"""Polars-flavored API over the Spark engine (reference surface:
modin/polars/__init__.py + dataframe.py:40, series.py, groupby.py).

Unlike the reference (which adapts its pandas query compiler), this veneer
maps polars expressions DIRECTLY onto Spark Column expressions — polars'
expression model (col("x").sum(), lazy select/filter pipelines) is the same
declarative shape Catalyst consumes, so `df.select/filter/group_by/agg`
compile to single Spark projections/aggregates with zero Python in the hot
path. ``lazy()``/``collect()`` are honest here: the engine is already lazy.

polars itself is NOT required (and is not installed in this environment);
the veneer implements the API shape, not a binding.
"""
from modin_spark.polars.expr import Expr, col, lit  # noqa: F401
from modin_spark.polars.expr import len  # noqa: F401,A004 (polars.len())
from modin_spark.polars.dataframe import (  # noqa: F401
    DataFrame, LazyFrame, Series, concat, from_pandas, read_csv,
    read_parquet, scan_csv, scan_parquet,
)

__all__ = [
    "DataFrame", "LazyFrame", "Series", "Expr", "col", "lit",
    "concat", "from_pandas", "read_parquet", "read_csv", "len",
    "scan_parquet", "scan_csv",
]
