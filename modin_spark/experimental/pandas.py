"""Experimental glob IO — parity with the reference's
``modin.experimental.pandas`` surface
(/root/reference/modin/experimental/pandas/io.py: read_csv_glob:302,
read_pickle_glob:306, to_pickle_glob:351, read_parquet_glob:405,
read_json_glob:489, read_xml_glob:606, read_custom_text:124, read_sql:33).

Spark-first mapping: csv/json/parquet globs are native Spark multi-file
scans (one task per split — the parallelism the reference builds by hand
is the default here), so those names are straight aliases. Pickle/XML have
no Spark source: the glob readers fan one task per file via ``from_map``
semantics (pandas parses a file per task), and ``to_pickle_glob`` writes
one pickle per partition from the executors — N files for N partitions,
matching the reference's layout contract.
"""

from __future__ import annotations

import glob as _glob

import pandas as pd

from modin_spark.pandas.dataframe import DataFrame
from modin_spark.pandas.io import (
    from_map,
    from_pandas,
    read_csv,
    read_json,
    read_parquet,
    read_sql,
)

# native Spark multi-file scans already accept glob patterns
read_csv_glob = read_csv
read_json_glob = read_json
read_parquet_glob = read_parquet


def _expand(pattern) -> list[str]:
    files = sorted(_glob.glob(str(pattern)))
    if not files:
        raise FileNotFoundError(f"no files match {pattern!r}")
    return files


def read_pickle_glob(filepath_or_buffer, compression="infer", **kw) -> DataFrame:
    """One task per file (the reference's partition contract: #partitions ==
    #input files); each task unpickles its file with pandas."""
    files = _expand(filepath_or_buffer)
    return from_map(lambda f: pd.read_pickle(f, compression=compression), files)


def to_pickle_glob(df, filepath_or_buffer, **kw) -> None:
    """Write one pickle per partition from the executors: ``path`` must
    contain a ``*`` that is replaced by the partition id (reference layout:
    a glob-set of frame parts that read_pickle_glob reassembles)."""
    path = str(filepath_or_buffer)
    if "*" not in path:
        raise ValueError("to_pickle_glob requires a '*' placeholder in the path")
    sdf = df.to_spark(ordered=True)

    def write(batches):
        from pyspark import TaskContext

        parts = [b for b in batches]
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            pdf.to_pickle(path.replace("*", str(TaskContext.get().partitionId())))
        yield pd.DataFrame({"n": [sum(len(p) for p in parts)]})

    sdf.mapInPandas(write, "n long").count()


def read_xml_glob(path_or_buffer, **kw) -> DataFrame:
    files = _expand(path_or_buffer)
    return from_map(lambda f: pd.read_xml(f, **kw), files)


def read_custom_text(filepath_or_buffer, columns, custom_parser, compression="infer", nrows=None) -> DataFrame:
    """Custom line-format reader (ref io.py:124): the parser receives a
    file handle per task and returns a pandas DataFrame with ``columns``."""
    files = _expand(filepath_or_buffer)

    def parse(f):
        import io

        opener = open
        if compression == "gzip" or (compression == "infer" and str(f).endswith(".gz")):
            import gzip

            opener = gzip.open
        with opener(f, "rt") as fh:
            out = custom_parser(fh)
        pdf = pd.DataFrame(out)
        pdf.columns = list(columns)
        return pdf.head(nrows) if nrows is not None else pdf

    return from_map(parse, files)


__all__ = [
    "read_csv_glob", "read_json_glob", "read_parquet_glob",
    "read_pickle_glob", "to_pickle_glob", "read_xml_glob",
    "read_custom_text", "read_sql", "from_pandas",
]
