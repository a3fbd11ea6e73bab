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


def test_xlsx_date_cells_roundtrip(tmp_path, spark):
    # date-styled serials (styles.xml numFmt) must come back as timestamps,
    # not raw floats (round-7 ADVICE)
    ts = pd.to_datetime(
        ["2023-01-15 00:00:00", "2024-06-30 12:30:45", "1999-12-31 23:59:59"]
    )
    pdf = pd.DataFrame({"d": ts, "v": [1, 2, 3]})
    p = str(tmp_path / "d.xlsx")
    write_xlsx(pdf, p)
    got = mpd.read_excel(p).to_pandas()
    assert str(got["d"].dtype).startswith("datetime64")
    assert got["d"].tolist() == list(ts)
    assert got["v"].tolist() == [1, 2, 3]


def test_xlsx_blank_row_gaps(tmp_path, spark):
    # Excel omits <row> elements for blank rows; pandas emits all-NaN rows,
    # so header/skiprows indexing must follow the logical grid
    import zipfile

    p = str(tmp_path / "g.xlsx")
    write_xlsx(pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}), p)
    # rewrite the sheet with a gap: header r=1, data r=2, r=4 (r=3 blank)
    with zipfile.ZipFile(p) as zf:
        names = {n: zf.read(n) for n in zf.namelist()}
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>b</t></is></c></row>'
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>x</t></is></c></row>'
        '<row r="4"><c r="A4"><v>3</v></c><c r="B4" t="inlineStr"><is><t>z</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    names["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, data in names.items():
            zf.writestr(n, data)
    got = mpd.read_excel(p).to_pandas()
    assert len(got) == 3  # blank row materialized, not dropped
    assert got["a"].fillna(-1).tolist() == [1.0, -1.0, 3.0]
    assert got["b"].fillna("␀").tolist() == ["x", "␀", "z"]
    # skiprows counts logical rows (skip header+first data row -> blank first)
    got2 = mpd.read_excel(p, header=None, skiprows=2, names=["a", "b"]).to_pandas()
    assert len(got2) == 2
    assert got2["a"].fillna(-1).tolist() == [-1.0, 3.0]


def test_xlsx_duplicate_headers_mangled(tmp_path, spark):
    # pandas mangles duplicate header labels x, x -> x, x.1
    pdf = pd.DataFrame([[1, 2, 3], [4, 5, 6]], columns=["x", "y", "x"])
    p = str(tmp_path / "dup.xlsx")
    write_xlsx(pdf, p)
    got = mpd.read_excel(p).to_pandas()
    assert list(got.columns) == ["x", "y", "x.1"]
    assert got["x"].tolist() == [1, 4]
    assert got["x.1"].tolist() == [3, 6]


def test_xlsx_non_integral_float_not_truncated(tmp_path, spark):
    # a bigint-inferred column (sample all-integral) hitting 2.5 later must
    # null, not truncate to 2 (round-7 ADVICE)
    n = 300  # inference sample is 200 rows
    vals = [float(i) for i in range(n)]
    vals[250] = 2.5
    pdf = pd.DataFrame({"v": vals})
    # write ints for the sample (floats that are integral serialize as x.0
    # and infer double; force bigint inference with true ints)
    pdf["v"] = pd.Series(
        [int(v) if float(v).is_integer() else v for v in vals], dtype=object
    )
    p = str(tmp_path / "tr.xlsx")
    write_xlsx(pdf, p)
    got = mpd.read_excel(p).to_pandas()
    assert got["v"].iloc[249] == 249
    assert pd.isna(got["v"].iloc[250])  # nulled, NOT truncated to 2
    assert got["v"].iloc[251] == 251


def test_multisheet_write_read_dict(spark, tmp_path):
    # r7: multi-sheet workbook written by the stdlib writer, every sheet
    # read back DISTRIBUTED (sheet_name=None -> dict keyed by sheet name;
    # the pandas delegate would ImportError here, so a passing read proves
    # the parallel path)
    import pandas as pd

    from modin_spark.sources.excel import write_xlsx

    p = str(tmp_path / "multi.xlsx")
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = pd.DataFrame({"n": [1.5, 2.5]})
    write_xlsx({"alpha": a, "beta": b}, p)

    import modin_spark.pandas as mpd

    d = mpd.read_excel(p, sheet_name=None)
    assert set(d) == {"alpha", "beta"}
    pd.testing.assert_frame_equal(d["alpha"].to_pandas(), a, check_dtype=False)
    pd.testing.assert_frame_equal(d["beta"].to_pandas(), b, check_dtype=False)


def test_multisheet_list_keys_like_pandas(spark, tmp_path):
    import pandas as pd

    from modin_spark.sources.excel import write_xlsx

    p = str(tmp_path / "multi2.xlsx")
    write_xlsx({"s1": pd.DataFrame({"a": [1]}), "s2": pd.DataFrame({"b": [2]})}, p)

    import modin_spark.pandas as mpd

    d = mpd.read_excel(p, sheet_name=[0, "s2"])
    # pandas keys the dict by the given identifier: int stays int
    assert set(d) == {0, "s2"}
    assert list(d[0].to_pandas().columns) == ["a"]
    assert list(d["s2"].to_pandas().columns) == ["b"]


def test_single_sheet_write_still_works(spark, tmp_path):
    import pandas as pd

    from modin_spark.sources.excel import write_xlsx

    p = str(tmp_path / "single.xlsx")
    a = pd.DataFrame({"v": [10, 20], "s": ["p", "q"]})
    write_xlsx(a, p, sheet_name="Data")

    import modin_spark.pandas as mpd

    got = mpd.read_excel(p, sheet_name="Data").to_pandas()
    pd.testing.assert_frame_equal(got, a, check_dtype=False)
