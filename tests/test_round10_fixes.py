"""Round-10 fixes: the five round-9 ADVICE defects plus the verdict's
"What's wrong" list (reset_index on RangeIndex, distributed frame
value_counts, scalable ngroup, Series.unique appearance order). Every case
diverged from real pandas (or was a scale anti-pattern) before the fix."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def eq_frame(got, want, reset=True):
    if reset:
        got, want = got.reset_index(drop=True), want.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_index_type=False)


def eq_ser(got, want, check_index=False):
    if not check_index:
        got, want = got.reset_index(drop=True), want.reset_index(drop=True)
    pd.testing.assert_series_equal(
        got, want, check_dtype=False, check_index_type=False, check_names=False,
    )


# ---------------------------------------------------------------- ADVICE r9

def test_to_numeric_downcast_integer_lossless_only():
    # ADVICE high: int64 values past 2**31 must NOT wrap to int32
    p = pd.Series([1, 2**40, 3], name="x")
    m = mpd.from_pandas(p.to_frame())["x"]
    rp = pd.to_numeric(p, downcast="integer")
    rm = mpd.to_numeric(m, downcast="integer").to_pandas()
    assert str(rp.dtype) == str(rm.dtype) == "int64"
    assert list(rp) == list(rm)
    # small values narrow to the smallest width, like pandas
    p2 = pd.Series([1, 2, 3], name="x")
    m2 = mpd.from_pandas(p2.to_frame())["x"]
    assert str(mpd.to_numeric(m2, downcast="integer").to_pandas().dtype) == "int8"
    # fractional values block integer downcast entirely
    p3 = pd.Series([1.0, 2.5], name="x")
    m3 = mpd.from_pandas(p3.to_frame())["x"]
    assert mpd.to_numeric(m3, downcast="integer").to_pandas().dtype.kind == "f"


def test_to_numeric_downcast_float_lossless_only():
    # float64 -> float32 only when the round-trip is exact for every value
    p = pd.Series([0.5, 1.5], name="x")
    m = mpd.from_pandas(p.to_frame())["x"]
    assert str(mpd.to_numeric(m, downcast="float").to_pandas().dtype) == "float32"
    p2 = pd.Series([0.1, 1e300], name="x")  # 0.1 and 1e300 both lossy in f32
    m2 = mpd.from_pandas(p2.to_frame())["x"]
    rm2 = mpd.to_numeric(m2, downcast="float").to_pandas()
    assert str(rm2.dtype) == "float64" and rm2.iloc[1] == 1e300


def test_to_numeric_coerce_still_works():
    p = pd.Series(["1.5", "oops", "2"], name="x")
    m = mpd.from_pandas(p.to_frame())["x"]
    rp = pd.to_numeric(p, errors="coerce")
    rm = mpd.to_numeric(m, errors="coerce").to_pandas()
    assert list(rp.fillna(-1)) == list(rm.fillna(-1))


def test_str_startswith_empty_tuple():
    # ADVICE low: s.str.startswith(()) is valid pandas -> all-False, NaN for null
    p = pd.Series(["ab", None, "cd"], name="x")
    m = mpd.from_pandas(p.to_frame())["x"]
    for which in ("startswith", "endswith"):
        rp = getattr(p.str, which)(())
        rm = getattr(m.str, which)(()).to_pandas()
        assert list(rp.fillna(-9)) == list(rm.fillna(-9))
        rp2 = getattr(p.str, which)((), na=False)
        rm2 = getattr(m.str, which)((), na=False).to_pandas()
        assert list(rp2) == list(rm2) == [False, False, False]


def test_reindex_fill_value_preserves_matched_nans():
    # ADVICE medium: fill_value fills only ABSENT labels; matched rows'
    # pre-existing NaN cells stay NaN
    p = pd.DataFrame({"k": ["a", "b", "c"], "v": [1.0, np.nan, 3.0],
                      "w": [np.nan, 5.0, 6.0]}).set_index("k")
    m = mpd.from_pandas(p.reset_index()).set_index("k")
    rp = p.reindex(index=["a", "b", "z"], fill_value=0)
    rm = m.reindex(index=["a", "b", "z"], fill_value=0).to_pandas()
    assert rp.fillna(-9).eq(rm.fillna(-9)).all().all()
    assert np.isnan(rm.loc["a", "w"]) and np.isnan(rm.loc["b", "v"])


def test_drop_index_after_filter_uses_original_labels():
    # ADVICE medium: after df[mask], drop(index=k) drops the row LABELED k
    p = pd.DataFrame({"a": [10, 20, 30, 40, 50]})
    m = mpd.from_pandas(p)
    rp = p[p["a"] > 10].drop(index=2)
    rm = m[m["a"] > 10].drop(index=2).to_pandas()
    assert list(rp["a"]) == list(rm["a"]) == [20, 40, 50]
    assert list(rp.index) == list(rm.index) == [1, 3, 4]


def test_crosstab_margins_normalize():
    # ADVICE low: margins=True + normalize must not double-count the margin
    df = pd.DataFrame({"r": ["x", "x", "y", "y", "y"],
                       "c": ["p", "q", "p", "p", "q"]})
    mdf = mpd.from_pandas(df)
    for norm in ["index", "columns", "all", True]:
        rp = pd.crosstab(df["r"], df["c"], margins=True, normalize=norm)
        rm = mpd.crosstab(mdf["r"], mdf["c"], margins=True, normalize=norm).to_pandas()
        rm = rm.reindex(index=list(rp.index), columns=list(rp.columns))
        assert rp.shape == rm.shape, norm
        assert np.allclose(rp.values.astype(float), rm.values.astype(float)), norm
