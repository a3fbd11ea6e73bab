"""Elementwise/scalar function library: arithmetic, str_*, dt_*, missing data."""

import numpy as np
import pandas as pd
import pytest

from tests.conftest import assert_df_equal, assert_series_equal


def test_arithmetic(mdf, pdf):
    assert_series_equal(mdf.a + mdf.b, pdf.a + pdf.b)
    assert_series_equal(mdf.a - 3, pdf.a - 3)
    assert_series_equal(3 - mdf.a, 3 - pdf.a)
    assert_series_equal(mdf.a * mdf.a, pdf.a * pdf.a)
    assert_series_equal(mdf.b / mdf.a.replace(0, 1), pdf.b / pdf.a.replace(0, 1))
    assert_series_equal(mdf.a % 7, pdf.a % 7)
    assert_series_equal(mdf.a**2, pdf.a**2)


def test_comparisons_nan(mdf, pdf):
    assert_series_equal(mdf.c > 5, pdf.c > 5)
    assert_series_equal(mdf.c.isna(), pdf.c.isna())
    assert_series_equal(mdf.c.notna(), pdf.c.notna())


def test_fillna_dropna(mdf, pdf):
    assert_series_equal(mdf.c.fillna(-1.0), pdf.c.fillna(-1.0))
    assert_df_equal(mdf.dropna(subset=["c"]), pdf.dropna(subset=["c"]))
    assert_df_equal(mdf.fillna({"c": 0.0}), pdf.fillna({"c": 0.0}))


def test_clip_round_abs(mdf, pdf):
    assert_series_equal(mdf.b.clip(10, 90), pdf.b.clip(10, 90))
    assert_series_equal(mdf.b.round(2), pdf.b.round(2))
    assert_series_equal((-mdf.a).abs(), (-pdf.a).abs())


def test_isin_between(mdf, pdf):
    assert_series_equal(mdf.a.isin([1, 2, 3, 50]), pdf.a.isin([1, 2, 3, 50]))
    assert_series_equal(mdf.a.between(20, 60), pdf.a.between(20, 60))


def test_replace_map(mdf, pdf):
    assert_series_equal(mdf.k.replace({"x": "X"}), pdf.k.replace({"x": "X"}))
    assert_series_equal(
        mdf.k.map({"x": 1, "y": 2, "z": 3}), pdf.k.map({"x": 1, "y": 2, "z": 3})
    )


def test_where_mask(mdf, pdf):
    assert_series_equal(mdf.a.where(mdf.a > 50, -1), pdf.a.where(pdf.a > 50, -1))
    assert_series_equal(mdf.a.mask(mdf.a > 50, -1), pdf.a.mask(pdf.a > 50, -1))


def test_astype_cast(mdf, pdf):
    assert_series_equal(mdf.b.astype("int64"), pdf.b.astype("int64"))
    assert_series_equal(mdf.a.astype(str), pdf.a.astype(str))


STR_CASES = [
    ("upper", (), {}),
    ("lower", (), {}),
    ("len", (), {}),
    ("strip", (), {}),
    ("capitalize", (), {}),
    ("startswith", ("Str",), {}),
    ("endswith", ("3",), {}),
    ("contains", ("1",), {}),
    ("replace", ("_", "-"), {}),
    ("slice", (1, 4), {}),
    ("zfill", (10,), {}),
    ("repeat", (2,), {}),
    ("removeprefix", ("Str_",), {}),
]


@pytest.mark.parametrize("name,args,kw", STR_CASES, ids=[c[0] for c in STR_CASES])
def test_str_ops(mdf, pdf, name, args, kw):
    got = getattr(mdf.s.str, name)(*args, **kw)
    ref = getattr(pdf.s.str, name)(*args, **kw)
    assert_series_equal(got, ref)


def test_str_split_get(mdf, pdf):
    assert_series_equal(mdf.s.str.split("_").str[0] if False else mdf.s.str.get(0), pdf.s.str.get(0))


DT_CASES = ["year", "month", "day", "hour", "minute", "dayofweek", "dayofyear", "quarter",
            "is_month_start", "is_month_end", "daysinmonth", "is_leap_year"]


@pytest.mark.parametrize("name", DT_CASES)
def test_dt_ops(mdf, pdf, name):
    got = getattr(mdf.t.dt, name)
    ref = getattr(pdf.t.dt, name)
    got_p = got.to_pandas()
    if ref.dtype.kind == "b":
        assert (got_p.astype(bool) == ref.reset_index(drop=True)).all()
    else:
        assert (got_p.astype("int64") == ref.astype("int64").reset_index(drop=True)).all()


def test_dt_strftime_month_name(mdf, pdf):
    assert_series_equal(mdf.t.dt.strftime("%Y-%m-%d"), pdf.t.dt.strftime("%Y-%m-%d"))
    assert_series_equal(mdf.t.dt.month_name(), pdf.t.dt.month_name())


def test_to_datetime_to_numeric(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame({"d": ["2024-01-02", "2024-05-06"], "n": ["1.5", "2.5"]})
    m = mpd.from_pandas(p)
    assert_series_equal(mpd.to_datetime(m["d"]), pd.to_datetime(p["d"]))
    assert_series_equal(mpd.to_numeric(m["n"]), pd.to_numeric(p["n"]))


def test_series_apply_udf(mdf, pdf):
    assert_series_equal(mdf.a.apply(lambda x: x * 3 + 1), pdf.a.apply(lambda x: x * 3 + 1))


def test_row_apply(mdf, pdf):
    got = mdf[["a", "b"]].apply(lambda r: r["a"] + r["b"], axis=1)
    ref = pdf[["a", "b"]].apply(lambda r: r["a"] + r["b"], axis=1)
    assert_series_equal(got, ref)


def test_cut_qcut(mdf, pdf):
    import modin_spark.pandas as mpd

    got = mpd.cut(mdf.b, [0, 25, 50, 75, 100], labels=["q1", "q2", "q3", "q4"])
    ref = pd.cut(pdf.b, [0, 25, 50, 75, 100], labels=["q1", "q2", "q3", "q4"]).astype(str)
    assert_series_equal(got, ref)


def test_frame_binary_aligned(mdf, pdf):
    got = (mdf[["a", "b"]] + mdf[["a", "b"]]).to_pandas()
    ref = pdf[["a", "b"]] + pdf[["a", "b"]]
    np.testing.assert_allclose(got.values.astype(float), ref.values.astype(float), rtol=1e-9)
    got = mdf[["a", "b"]].mul(mdf[["a", "b"]]).to_pandas()
    ref = pdf[["a", "b"]].mul(pdf[["a", "b"]])
    np.testing.assert_allclose(got.values.astype(float), ref.values.astype(float), rtol=1e-9)


def test_frame_binary_unaligned(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"x": [10.0, 20.0, 30.0]})
    got = (mpd.from_pandas(a) + mpd.from_pandas(b)).to_pandas()
    np.testing.assert_allclose(got["x"].values, (a + b)["x"].values)


def test_frame_binary_scalar(mdf, pdf):
    got = (mdf[["a", "b"]] + 5).to_pandas()
    ref = pdf[["a", "b"]] + 5
    np.testing.assert_allclose(got.values.astype(float), ref.values.astype(float), rtol=1e-9)


def test_pipe_take_prefix_squeeze(mdf, pdf):
    assert mdf.pipe(lambda d: len(d)) == len(pdf)
    got = mdf.take([0, 2, 4]).to_pandas()
    assert len(got) == 3
    assert list(mdf.add_prefix("p_").columns) == [f"p_{c}" for c in pdf.columns]
    s = mdf[["a"]].squeeze()
    from modin_spark.pandas.series import Series as MS

    assert isinstance(s, MS)


def test_series_duplicated_valid_index(mdf, pdf):
    got = mdf["k"].duplicated().to_pandas()
    ref = pdf["k"].duplicated()
    assert (got.values == ref.values).all()
    p = pd.DataFrame({"v": [np.nan, np.nan, 1.0, 2.0, np.nan]})
    import modin_spark.pandas as mpd

    m = mpd.from_pandas(p)
    assert m["v"].first_valid_index() == p["v"].first_valid_index()
    assert m["v"].last_valid_index() == p["v"].last_valid_index()


def test_series_dot_frame_dot(mdf, pdf):
    got = mdf["a"].dot(mdf["a"])
    ref = float((pdf["a"] * pdf["a"]).sum())
    np.testing.assert_allclose(got, ref, rtol=1e-9)
    w = pd.Series({"a": 2.0, "b": 0.5})
    gotf = mdf[["a", "b"]].dot(w).to_pandas()
    reff = pdf[["a", "b"]].dot(w)
    np.testing.assert_allclose(gotf.values, reff.values, rtol=1e-9)


def test_memory_usage(mdf):
    mu = mdf.memory_usage()
    assert (mu > 0).all()


def test_update(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"k": [1, 2, 3], "v": [1.0, np.nan, 3.0]})
    b = pd.DataFrame({"k": [2], "v": [99.0]})
    ma = mpd.from_pandas(a).set_index("k")
    ma.update(mpd.from_pandas(b).set_index("k"))
    got = ma.reset_index().to_pandas().sort_values("k").reset_index(drop=True)
    assert got["v"].tolist() == [1.0, 99.0, 3.0]


def test_list_struct_accessors(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame({"a": [[1, 2, 3], [4], None]})
    m = mpd.from_pandas(p)
    assert m["a"].list.len().to_pandas().fillna(-1).tolist() == [3.0, 1.0, -1.0]
    assert m["a"].list[0].to_pandas().fillna(-1).tolist() == [1.0, 4.0, -1.0]
    s = mpd.from_pandas(pd.DataFrame({"x": [1, 2]}))
    s["st"] = None
    # struct built via Spark expr
    from pyspark.sql import functions as F

    fr = s._frame.with_columns(["st"], [F.struct(F.lit(1).alias("u"), F.lit("a").alias("v"))])
    import modin_spark.pandas as mpd2

    df = mpd2.DataFrame(_frame=fr)
    ex = df["st"].struct.explode().to_pandas()
    assert list(ex.columns) == ["u", "v"]
    assert df["st"].struct.field("u").to_pandas().tolist() == [1, 1]


def test_cat_codes(mdf, pdf):
    got = mdf["k"].cat.codes.to_pandas()
    ref = pdf["k"].astype("category").cat.codes
    assert (got.values == ref.values).all()
    assert list(mdf["k"].cat.categories) == list(pdf["k"].astype("category").cat.categories)


def test_cross_merge(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"y": ["p", "q", "r"]})
    got = mpd.from_pandas(a).merge(mpd.from_pandas(b), how="cross").to_pandas()
    ref = a.merge(b, how="cross")
    assert sorted(map(tuple, got.values.tolist())) == sorted(map(tuple, ref.values.tolist()))


def test_arrow_roundtrip(mdf, pdf):
    import modin_spark.pandas as mpd

    t = mdf[["a", "b"]].to_arrow()
    back = mpd.from_arrow(t).to_pandas()
    np.testing.assert_allclose(back["a"].values, pdf["a"].values)
