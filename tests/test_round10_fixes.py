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


# ------------------------------------------------------- verdict r9 items

def test_reset_index_default_rangeindex_adds_column():
    # verdict #1: pandas ADDS an "index" column (0..n-1); was a silent no-op
    p = pd.DataFrame({"a": [10, 20, 30], "b": ["x", "y", "z"]})
    m = mpd.from_pandas(p)
    rp, rm = p.reset_index(), m.reset_index().to_pandas()
    assert list(rm.columns) == ["index", "a", "b"]
    eq_frame(rm, rp)
    # after a filter the column holds the ORIGINAL labels, new index 0..n-1
    rp2 = p[p["a"] > 10].reset_index()
    rm2 = m[m["a"] > 10].reset_index().to_pandas()
    assert list(rm2["index"]) == list(rp2["index"]) == [1, 2]
    assert list(rm2.index) == [0, 1]
    # drop=True renumbers filtered labels
    rm3 = m[m["a"] > 10].reset_index(drop=True).to_pandas()
    assert list(rm3.index) == [0, 1]
    # chains into groupby like pandas
    rp4 = p.reset_index().groupby("b").agg(s=("index", "sum")).reset_index().sort_values("b")
    rm4 = m.reset_index().groupby("b").agg(s=("index", "sum")).reset_index().sort_values("b").to_pandas()
    assert list(rp4["s"]) == list(rm4["s"])


def test_frame_value_counts_distributed_engine_series():
    p = pd.DataFrame({"a": [3.0, 1, 2, 1, 3, 2, None],
                      "b": ["x", "y", "x", "z", "y", "x", "x"]})
    m = mpd.from_pandas(p)

    def norm(s):
        return sorted(
            (tuple(str(x) for x in (i if isinstance(i, tuple) else (i,))), round(float(c), 9))
            for i, c in s.items()
        )

    for kw in [{}, {"normalize": True}, {"sort": False}, {"dropna": False},
               {"subset": ["b"]}, {"ascending": True}]:
        rm = m.value_counts(**kw)
        assert isinstance(rm, mpd.Series), "must return an ENGINE Series"
        assert norm(rm.to_pandas()) == norm(p.value_counts(**kw)), kw
    # scale guard: no driver materialization in the plan build (lazy until
    # to_pandas) — constructing the result must not trigger a collect
    big = m.value_counts()
    assert hasattr(big, "_frame")


def test_groupby_ngroup_scalable_and_correct():
    p = pd.DataFrame({"a": [3.0, 1, 2, 1, 3, 2, None],
                      "b": ["x", "y", "x", "z", "y", "x", "x"]})
    m = mpd.from_pandas(p)
    for sort in (True, False):
        for asc in (True, False):
            gp = p.groupby("b", sort=sort).ngroup(ascending=asc)
            gm = m.groupby("b", sort=sort).ngroup(ascending=asc).to_pandas()
            assert list(gp) == list(gm), (sort, asc)
    # null keys: NaN under dropna=True, numbered last under dropna=False
    gp = p.groupby("a").ngroup()
    gm = m.groupby("a").ngroup().to_pandas()
    assert list(gp.fillna(-9)) == list(gm.fillna(-9))
    gp2 = p.groupby("a", dropna=False).ngroup()
    gm2 = m.groupby("a", dropna=False).ngroup().to_pandas()
    assert list(gp2) == list(gm2)
    # scale: numbering must not route ALL distinct groups through one task
    from modin_spark import plans

    s = m.groupby("b").ngroup()
    sdf = s._to_frame().sdf
    assert plans.unsafe_single_partition_exchanges(sdf) == 0, plans.physical_plan(sdf)


def test_series_unique_appearance_order():
    s = pd.Series([3, 1, 3, 2, 1, 5], name="u")
    ms = mpd.from_pandas(s.to_frame())["u"]
    assert list(ms.unique()) == list(s.unique()) == [3, 1, 2, 5]
    # survives a filter (labels differ from positions)
    pf, mf = s.to_frame(), mpd.from_pandas(s.to_frame())
    pfil, mfil = pf[pf["u"] > 1]["u"], mf[mf["u"] > 1]["u"]
    assert list(mfil.unique()) == list(pfil.unique()) == [3, 2, 5]
