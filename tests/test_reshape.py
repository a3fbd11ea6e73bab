"""Reshape + new frame ops: stack/unstack/pivot/transpose, pct_change,
interpolate, combine_first, equals, compare, mode, wide_to_long."""

import numpy as np
import pandas as pd
import pytest

from tests.conftest import assert_df_equal


def test_frame_reductions(mdf, pdf):
    num = ["a", "b", "c"]
    for op in ["prod", "skew", "kurt", "sem"]:
        got = getattr(mdf[num], op)()
        ref = getattr(pdf[num], op)()
        np.testing.assert_allclose(got.values.astype(float), ref.values.astype(float), rtol=1e-6)


def test_any_all(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame({"x": [True, False, True], "y": [False, False, False], "z": [1, 2, 3]})
    m = mpd.from_pandas(p)
    assert m.any().tolist() == p.any().tolist()
    assert m.all().tolist() == p.all().tolist()


def test_mode(mdf, pdf):
    got = mdf[["k"]].mode().to_pandas()
    ref = pdf[["k"]].mode()
    assert got["k"].iloc[0] == ref["k"].iloc[0]


def test_pct_change(mdf, pdf):
    got = mdf[["b"]].pct_change().to_pandas()
    ref = pdf[["b"]].pct_change()
    np.testing.assert_allclose(got["b"].values, ref["b"].values, rtol=1e-9, equal_nan=True)


def test_interpolate(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame({"v": [np.nan, 1.0, np.nan, np.nan, 4.0, np.nan, np.nan], "w": [1.0] * 7})
    m = mpd.from_pandas(p)
    got = m.interpolate().to_pandas()
    ref = p.interpolate()
    np.testing.assert_allclose(got["v"].values, ref["v"].values, rtol=1e-9, equal_nan=True)


def test_stack(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame({"x": [1, 2], "y": [3, 4]})
    got = mpd.from_pandas(p).stack().to_pandas()
    exp = p.stack()
    pd.testing.assert_series_equal(got, exp, check_dtype=False, check_names=False)
    # NaN cells drop (classic stack) and order is row-major
    p2 = pd.DataFrame({"x": [1.0, np.nan], "y": [3.0, 4.0]})
    got2 = mpd.from_pandas(p2).stack().to_pandas()
    pd.testing.assert_series_equal(got2, p2.stack(), check_dtype=False, check_names=False)


def test_pivot(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame({"i": [1, 1, 2, 2], "c": ["a", "b", "a", "b"], "v": [10.0, 20.0, 30.0, 40.0]})
    got = mpd.from_pandas(p).pivot(index="i", columns="c", values="v").reset_index().to_pandas()
    ref = p.pivot(index="i", columns="c", values="v").reset_index()
    ref.columns = ["i", "a", "b"]
    assert_df_equal(got.sort_values("i").reset_index(drop=True), ref, sort_by=["i"])


def test_transpose(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame({"x": [1, 2], "y": [3, 4]})
    got = mpd.from_pandas(p).T.to_pandas()
    assert got.values.tolist() == p.T.values.tolist()


def test_combine_first(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"k": [1, 2, 3], "v": [1.0, np.nan, 3.0]})
    b = pd.DataFrame({"k": [2, 3, 4], "v": [20.0, 30.0, 40.0]})
    got = (
        mpd.from_pandas(a).set_index("k").combine_first(mpd.from_pandas(b).set_index("k"))
        .reset_index().to_pandas().sort_values("k").reset_index(drop=True)
    )
    ref = a.set_index("k").combine_first(b.set_index("k")).reset_index()
    assert_df_equal(got, ref, sort_by=["k"])


def test_equals(mdf, pdf):
    import modin_spark.pandas as mpd

    assert mdf.equals(mpd.from_pandas(pdf))
    p2 = pdf.copy()
    p2.loc[5, "a"] = -999
    assert not mdf.equals(mpd.from_pandas(p2))


def test_compare(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"x": [1, 2, 3], "y": ["p", "q", "r"]})
    b = pd.DataFrame({"x": [1, 9, 3], "y": ["p", "q", "z"]})
    got = mpd.from_pandas(a).compare(mpd.from_pandas(b)).to_pandas()
    assert len(got) == 2  # rows 1 and 2 differ


def test_wide_to_long(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame({"id": [1, 2], "A1970": [10.0, 11.0], "A1980": [20.0, 21.0], "X": [9, 8]})
    # r9: wide_to_long returns the pandas-exact (i, j)-indexed long frame
    got = mpd.wide_to_long(mpd.from_pandas(p), ["A"], i="id", j="year").reset_index().to_pandas()
    ref = pd.wide_to_long(p, ["A"], i="id", j="year").reset_index()[["id", "A"]]
    got2 = got.sort_values(["id", "year"]).reset_index(drop=True)
    ref2 = (
        pd.wide_to_long(p, ["A"], i="id", j="year").reset_index().sort_values(["id", "year"]).reset_index(drop=True)
    )
    np.testing.assert_allclose(got2["A"].astype(float).values, ref2["A"].astype(float).values)
    assert got2["year"].astype(int).tolist() == ref2["year"].astype(int).tolist()


def test_merge_ordered(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"k": [1, 3, 5], "u": ["a", "b", "c"]})
    b = pd.DataFrame({"k": [2, 3, 6], "v": [1.0, 2.0, 3.0]})
    got = mpd.merge_ordered(mpd.from_pandas(a), mpd.from_pandas(b), on="k").to_pandas()
    ref = pd.merge_ordered(a, b, on="k")
    assert_df_equal(got, ref, sort_by=["k"])


def test_resample_prod_sem_quantile(spark):
    """Round-3 resample tail — values agree with pandas on every observed
    bucket (ours is sparse: empty buckets are not emitted)."""
    import numpy as np

    import modin_spark.pandas as mpd

    ev = mpd.read_parquet("/root/testdata/sf0.001/events.parquet").set_index("ts")
    pev = pd.read_parquet("/root/testdata/sf0.001/events.parquet").set_index("ts")
    for name, arg in [("prod", None), ("sem", None), ("quantile", 0.5)]:
        r, rp = ev[["value"]].resample("1h"), pev[["value"]].resample("1h")
        a = (getattr(r, name)(arg) if arg else getattr(r, name)()).to_pandas()["value"]
        b = (getattr(rp, name)(arg) if arg else getattr(rp, name)())["value"]
        a.index = pd.to_datetime(a.index)
        j = pd.concat([a.rename("a"), b.rename("b")], axis=1, join="inner").dropna()
        assert len(j) > 200 and np.allclose(j["a"], j["b"], rtol=1e-9), name
