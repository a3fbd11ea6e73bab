"""Polars-veneer tests (reference surface: modin/polars/dataframe.py:40).
polars itself is not installed here, so expectations are computed with
pandas equivalents of the documented polars semantics."""
import warnings

import numpy as np
import pandas as pd
import pytest

import modin_spark.polars as pl

warnings.filterwarnings("ignore")

PDF = pd.DataFrame({
    "g": ["a", "b", "a", "b", "a"],
    "x": [1, 2, 3, 4, 5],
    "y": [10.0, 20.0, 30.0, 40.0, 50.0],
    "s": ["Foo", "bar", "Baz", "qux", "Quux"],
})


def mk():
    return pl.DataFrame(PDF)


def test_metadata():
    df = mk()
    assert df.columns == ["g", "x", "y", "s"]
    assert df.shape == (5, 4)
    assert df.height == 5 and df.width == 4
    assert len(df) == 5
    assert not df.is_empty()


def test_select_exprs():
    df = mk()
    out = df.select(pl.col("x"), (pl.col("y") * 2).alias("y2")).to_pandas()
    assert out["x"].tolist() == [1, 2, 3, 4, 5]
    assert out["y2"].tolist() == [20.0, 40.0, 60.0, 80.0, 100.0]
    # named exprs
    out2 = df.select(double_x=pl.col("x") * 2).to_pandas()
    assert out2["double_x"].tolist() == [2, 4, 6, 8, 10]
    # aggregate select -> 1 row
    out3 = df.select(pl.col("x").sum().alias("sx"), pl.col("y").mean().alias("my"))
    assert out3.to_dicts() == [{"sx": 15, "my": 30.0}]


def test_filter_and_chain():
    df = mk()
    out = (df.filter(pl.col("x") > 2)
             .filter(pl.col("g") == "a")
             .select("x", "y").to_pandas())
    assert out["x"].tolist() == [3, 5]


def test_with_columns_and_row_index():
    df = mk()
    out = df.with_columns((pl.col("x") + 100).alias("x100"),
                          pl.col("s").str.to_uppercase().alias("S")).to_pandas()
    assert out["x100"].tolist() == [101, 102, 103, 104, 105]
    assert out["S"].tolist() == ["FOO", "BAR", "BAZ", "QUX", "QUUX"]
    ri = df.with_row_index("rn", offset=1).to_pandas()
    assert ri["rn"].tolist() == [1, 2, 3, 4, 5]
    assert ri.columns[0] == "rn"


def test_group_by_agg():
    df = mk()
    out = (df.group_by("g")
             .agg(pl.col("x").sum().alias("sx"),
                  pl.col("y").mean().alias("my"),
                  pl.len().alias("n"))
             .sort("g").to_pandas())
    assert out["g"].tolist() == ["a", "b"]
    assert out["sx"].tolist() == [9, 6]
    assert out["my"].tolist() == [30.0, 30.0]
    assert out["n"].tolist() == [3, 2]
    # shortcut aggregations
    out2 = df.select("g", "x").group_by("g").sum().sort("g").to_pandas()
    assert out2["x"].tolist() == [9, 6]


def test_sort_descending_and_reverse():
    df = mk()
    assert df.sort("x", descending=True).to_pandas()["x"].tolist() == [5, 4, 3, 2, 1]
    assert df.reverse().to_pandas()["x"].tolist() == [5, 4, 3, 2, 1]


def test_join():
    left = pl.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    right = pl.DataFrame({"k": [2, 3, 4], "b": [200, 300, 400]})
    out = left.join(right, on="k", how="inner").sort("k").to_pandas()
    assert out["k"].tolist() == [2, 3]
    assert out["b"].tolist() == [200, 300]
    lo = left.join(right, on="k", how="left").sort("k").to_pandas()
    assert lo["b"].fillna(-1).tolist() == [-1, 200, 300]
    semi = left.join(right, on="k", how="semi").sort("k").to_pandas()
    assert semi["k"].tolist() == [2, 3]
    anti = left.join(right, on="k", how="anti").to_pandas()
    assert anti["k"].tolist() == [1]


def test_unique_drop_rename_nulls():
    df = pl.DataFrame({"a": [1, 1, 2], "b": [None, 5.0, 6.0]})
    assert df.unique(subset="a").sort("a").to_pandas()["a"].tolist() == [1, 2]
    assert df.drop("b").columns == ["a"]
    assert df.rename({"a": "A"}).columns == ["A", "b"]
    assert df.drop_nulls().to_pandas()["a"].tolist() == [1, 2]
    assert df.fill_null(0.0).to_pandas()["b"].tolist() == [0.0, 5.0, 6.0]
    assert df.null_count().to_dicts() == [{"a": 0, "b": 1}]


def test_stack_concat():
    a = pl.DataFrame({"x": [1]})
    b = pl.DataFrame({"x": [2]})
    assert pl.concat([a, b]).sort("x").to_pandas()["x"].tolist() == [1, 2]
    assert a.vstack(b).sort("x").to_pandas()["x"].tolist() == [1, 2]
    h = a.hstack([pl.Series("y", [9])]).to_pandas()
    assert h.values.tolist() == [[1, 9]]


def test_unpivot_pivot():
    df = pl.DataFrame({"id": [1, 2], "p": [10, 20], "q": [30, 40]})
    up = df.unpivot(on=["p", "q"], index="id").sort("id", "variable").to_pandas()
    assert up["value"].tolist() == [10, 30, 20, 40]
    back = (pl.DataFrame(up).pivot("variable", index="id", values="value")
            .sort("id").to_pandas())
    assert back["p"].tolist() == [10, 20]


def test_expr_namespaces_and_ops():
    df = mk()
    out = df.select(
        pl.col("s").str.contains("^B").alias("b"),
        pl.col("x").is_between(2, 4).alias("mid"),
        pl.col("x").cast("double").alias("xf"),
        (pl.col("x") % 2 == 0).alias("even"),
    ).to_pandas()
    assert out["b"].tolist() == [False, False, True, False, False]
    assert out["mid"].tolist() == [False, True, True, True, False]
    assert out["xf"].dtype.kind == "f"
    assert out["even"].tolist() == [False, True, False, True, False]


def test_dt_namespace():
    df = pl.DataFrame({"t": pd.to_datetime(["2024-03-05 10:30", "2023-12-31 23:59"])})
    out = df.select(pl.col("t").dt.year().alias("y"),
                    pl.col("t").dt.month().alias("m"),
                    pl.col("t").dt.hour().alias("h")).to_pandas()
    assert out["y"].tolist() == [2024, 2023]
    assert out["m"].tolist() == [3, 12]
    assert out["h"].tolist() == [10, 23]


def test_lazy_is_lazy_and_collects():
    df = mk()
    lf = df.lazy().filter(pl.col("x") > 3).select("x")
    assert isinstance(lf, pl.LazyFrame)
    out = lf.collect().to_pandas()
    assert out["x"].tolist() == [4, 5]
    lf2 = pl.scan_parquet("/root/testdata/sf0.001/region.parquet")
    assert lf2.collect().height == 5


def test_series():
    s = pl.Series("v", [3, 1, 2])
    assert s.name == "v"
    assert s.to_list() == [3, 1, 2]
    assert s.sum() == 6 and s.min() == 1 and s.max() == 3
    assert s.n_unique() == 3
    assert len(s) == 3
    assert sorted(s.unique().to_list()) == [1, 2, 3]
    assert pl.Series("one", [42]).item() == 42


def test_reductions_and_rows():
    df = mk()
    assert df.select("x", "y").sum().to_dicts() == [{"x": 15, "y": 150.0}]
    assert df.n_unique(subset="g") == 2
    assert df.head(2).rows() == [("a", 1, 10.0, "Foo"), ("b", 2, 20.0, "bar")]
    assert df.item(0, "x") == 1
    got = df.select(pl.col("y").max()).item()
    assert got == 50.0


def test_sql_and_io(tmp_path):
    df = mk()
    out = df.sql("select g, sum(x) as sx from self group by g order by g").to_pandas()
    assert out["sx"].tolist() == [9, 6]
    rp = pl.read_parquet("/root/testdata/sf0.001/region.parquet")
    assert rp.height == 5
    p = str(tmp_path / "t.csv")
    PDF.to_csv(p, index=False)
    rc = pl.read_csv(p)
    assert rc.height == 5 and "g" in rc.columns


def test_partition_by_and_slice():
    df = mk()
    parts = df.partition_by("g", as_dict=True)
    assert sorted(parts) == ["a", "b"]
    assert parts["a"].height == 3
    assert df.slice(1, 2).to_pandas()["x"].tolist() == [2, 3]
    assert df[1:3].to_pandas()["x"].tolist() == [2, 3]
    assert df["x"].to_list() == [1, 2, 3, 4, 5]
