"""Parallel xlsx reader (stdlib OOXML parse, executor-side chunk parsing —
reference: /root/reference/modin/core/io/text/excel_dispatcher.py) and the
stdlib writer behind to_excel. openpyxl is absent in this environment, so a
passing read PROVES the distributed path ran (the pandas delegate would
raise ImportError)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd
from modin_spark.sources.excel import read_xlsx_spark, write_xlsx

PDF = pd.DataFrame(
    {
        "i": np.arange(10, dtype="int64"),
        "f": np.arange(10) * 1.5,
        "s": [f"row {i} & <tag> \"q\"" for i in range(10)],
        "b": [i % 2 == 0 for i in range(10)],
        "n": [float(i) if i % 3 else np.nan for i in range(10)],
    }
)


def test_xlsx_roundtrip(tmp_path, spark):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(PDF, p)
    got = mpd.read_excel(p).to_pandas()
    assert list(got.columns) == list(PDF.columns)
    assert got["i"].tolist() == PDF["i"].tolist()
    np.testing.assert_allclose(got["f"], PDF["f"])
    assert got["s"].tolist() == PDF["s"].tolist()
    assert got["b"].tolist() == PDF["b"].tolist()
    np.testing.assert_allclose(got["n"], PDF["n"], equal_nan=True)


def test_xlsx_multi_chunk_parallel(tmp_path, spark):
    n = 5000
    big = pd.DataFrame({"a": np.arange(n, dtype="int64"), "t": [f"x{i}" for i in range(n)]})
    p = str(tmp_path / "big.xlsx")
    write_xlsx(big, p)
    sdf = read_xlsx_spark(p, chunk_rows=512)  # 10 chunks
    assert sdf.rdd.getNumPartitions() > 1
    got = sdf.toPandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == big["a"].tolist()
    assert got["t"].tolist() == big["t"].tolist()


def test_xlsx_kwargs(tmp_path, spark):
    p = str(tmp_path / "k.xlsx")
    write_xlsx(PDF, p)
    got = mpd.read_excel(p, usecols=["i", "s"], nrows=4).to_pandas()
    assert list(got.columns) == ["i", "s"]
    assert len(got) == 4
    got2 = mpd.read_excel(p, header=None, skiprows=1, names=["c0", "c1", "c2", "c3", "c4"]).to_pandas()
    assert len(got2) == 10
    assert got2["c0"].tolist() == PDF["i"].tolist()


def test_xlsx_sheet_name_and_to_excel(tmp_path, spark):
    p = str(tmp_path / "s.xlsx")
    mdf = mpd.from_pandas(PDF[["i", "f"]])
    mdf.to_excel(p, sheet_name="data", index=False)
    got = mpd.read_excel(p, sheet_name="data").to_pandas()
    assert got["i"].tolist() == PDF["i"].tolist()
    np.testing.assert_allclose(got["f"], PDF["f"])
    # integer sheet index hits the same sheet
    got0 = mpd.read_excel(p, sheet_name=0).to_pandas()
    assert got0["i"].tolist() == PDF["i"].tolist()


def test_xlsx_sparse_cells_and_width(tmp_path, spark):
    # rows with trailing missing cells: width comes from the widest row
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", None, "z"]})
    p = str(tmp_path / "sp.xlsx")
    write_xlsx(pdf, p)
    got = mpd.read_excel(p).to_pandas()
    assert got["a"].tolist() == [1, 2, 3]
    assert got["b"].fillna("␀").tolist() == ["x", "␀", "z"]


def test_xlsx_filter_after_read_stays_lazy(tmp_path, spark):
    p = str(tmp_path / "l.xlsx")
    write_xlsx(PDF, p)
    out = mpd.read_excel(p)
    f = out[out.i > 5][["i", "f"]].to_pandas()
    assert f["i"].tolist() == [6, 7, 8, 9]
