"""Source/sink registry — thin veneer over Spark's parallel readers.

The reference implements per-format parallel readers by hand
(/root/reference/modin/core/io/: byte-range CSV splitting, parquet row-group
splitting, JDBC OFFSET/LIMIT partitioning). Spark's DataSource V2 already
does all of that (split planning, pushdown, pruning), so this module only
maps names to readers and records capability notes per format.
"""

from modin_spark.pandas.io import (
    from_pandas,
    from_spark,
    read_csv,
    read_excel,
    read_feather,
    read_fwf,
    read_html,
    read_json,
    read_orc,
    read_parquet,
    read_pickle,
    read_sql,
    read_table,
)

# format -> (distributed?, notes)
CAPABILITIES = {
    "parquet": (True, "native; pushdown + pruning + row-group splits"),
    "orc": (True, "native"),
    "csv": (True, "native; byte-range splits (≙ reference text_file_dispatcher)"),
    "json": (True, "native (lines=True); multiLine is single-task per file"),
    "jdbc": (True, "partitionColumn/bounds partitioned reads"),
    "excel": (True, "xlsx: parallel stdlib OOXML reader (sources/excel.py) — row-aligned chunks parsed executor-side; multi-sheet dicts (sheet_name=None/list) read every sheet through the parallel path (r7); .xls falls back driver-side (reference is xlsx-only too)"),
    "pickle": (False, "driver-side pandas"),
    "feather": (True, "parallel Arrow IPC reader, one task per record batch; legacy v1 falls back driver-side"),
    "html": (False, "driver-side pandas"),
    "fwf": (True, "native csv line scan + substring/trim/cast codegen projections (sources/fwf.py); exotic kwargs fall back driver-side"),
    "delta/iceberg/hudi": (False, "jars not in this image; stubbed behind import-try"),
}

__all__ = [
    "CAPABILITIES",
    "from_pandas",
    "from_spark",
    "read_csv",
    "read_excel",
    "read_feather",
    "read_fwf",
    "read_html",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_pickle",
    "read_sql",
    "read_table",
]
