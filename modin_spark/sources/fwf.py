"""Parallel fixed-width-file reader.

Parity target: the reference parallelizes fwf through its text dispatcher
(/root/reference/modin/core/io/text/text_file_dispatcher.py) — byte chunks
parsed by parallel workers. Spark-first mapping (SURVEY §2's own suggestion):
read each line as ONE string column via the native distributed csv reader
(non-occurring separator, quoting disabled — header handling and byte-range
splits come for free), then project every field as a
``substring``/``trim``/``cast`` expression — all whole-stage codegen, no
Python in the row path.

Column spans and dtypes are inferred from a bounded driver-side sample
(pandas-style non-whitespace-run detection; documented sampling contract,
same as the csv/excel readers). Exotic kwargs fall back to the pandas
delegate in pandas/io.py.
"""

from __future__ import annotations

import io
import re

import numpy as np
import pandas as pd

_SAMPLE_LINES = 200


def _read_sample(path: str, n: int = _SAMPLE_LINES) -> list[str]:
    lines = []
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        for i, line in enumerate(fh):
            if i >= n:
                break
            lines.append(line.rstrip("\r\n"))
    return lines


def _infer_colspecs(lines: list[str]) -> list[tuple[int, int]]:
    """pandas-style colspec detection: union of non-whitespace runs across
    the sample; contiguous covered byte ranges become fields."""
    if not lines:
        return []
    width = max(len(line) for line in lines)
    mask = np.zeros(width + 1, dtype=bool)
    for line in lines:
        for m in re.finditer(r"\S+", line):
            mask[m.start() : m.end()] = True
    spans = []
    start = None
    for i, covered in enumerate(mask):
        if covered and start is None:
            start = i
        elif not covered and start is not None:
            spans.append((start, i))
            start = None
    if start is not None:
        spans.append((start, len(mask)))
    return spans


def read_fwf_spark(path: str, colspecs="infer", widths=None, names=None,
                   header: int | None = 0):
    """Distributed fwf read -> Spark DataFrame. Raises on anything it can't
    express — the caller falls back to the pandas delegate."""
    from pyspark.sql import functions as F

    from modin_spark.session import get_spark

    spark = get_spark()
    sample = _read_sample(path)
    if not sample:
        raise ValueError("empty fwf file")

    if widths is not None:
        spans, pos = [], 0
        for w in widths:
            spans.append((pos, pos + int(w)))
            pos += int(w)
    elif colspecs is None or colspecs == "infer":
        # the header line participates in detection, like pandas'
        # FixedWidthReader (its infer rows start at the top of the buffer)
        spans = _infer_colspecs(sample)
    else:
        spans = [(int(a), int(b)) for a, b in colspecs]
    if not spans:
        raise ValueError("no fwf columns detected")

    # names + dtypes from the pandas parse of the SAME sample (bounded;
    # keeps NA/float promotion rules identical to pandas)
    sample_txt = "\n".join(sample)
    sample_pdf = pd.read_fwf(
        io.StringIO(sample_txt), colspecs=spans, names=names, header=header
    )
    cols = [str(c) for c in sample_pdf.columns]

    def spark_type(dt) -> str:
        k = dt.kind
        if k in "iu":
            return "bigint"
        if k == "f":
            return "double"
        if k == "b":
            return "boolean"
        return "string"

    types = [spark_type(sample_pdf[c].dtype) for c in sample_pdf.columns]

    if header not in (0, None):
        raise ValueError("parallel fwf supports header=0 or None")

    # ONE string column per line via the native csv scan: a non-occurring
    # separator + disabled quoting; with an explicit schema the csv reader
    # consumes (not parses) the header line itself — no fragile
    # filter-by-value, correct per file
    raw = (
        spark.read.format("csv")
        .option("sep", "\x01")
        .option("quote", "")
        .option("header", "true" if header == 0 else "false")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .schema("__line__ string")
        .load(path)
    )

    # pandas' default NA token set (pandas.io.parsers STR_NA_VALUES): these
    # become NULL in EVERY column, string columns included — matching the
    # pandas delegate this reader falls back to for exotic kwargs
    na_tokens = [
        "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
        "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
        "n/a", "nan", "null",
    ]
    exprs = []
    for (a, b), c, t in zip(spans, cols, types):
        field = F.trim(F.substring(F.col("__line__"), a + 1, b - a))
        field = F.when(~field.isin(na_tokens), field)  # NA tokens -> NULL (pandas NaN)
        if t != "string":
            field = field.cast(t)
        exprs.append(field.alias(c))
    return raw.select(*exprs)
