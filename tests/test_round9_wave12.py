"""Round-9 probe wave 12 regressions (tools/probe_wave12.py): each case
diverged or errored vs real pandas before the fix."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

PDF = pd.DataFrame(
    {
        "a": [3, 1, 2, 1, 3, 2],
        "b": ["x", "y", "x", "z", "y", "x"],
        "c": [1.5, 2.5, None, 4.5, 5.5, 6.5],
        "d": [10, 20, 30, 40, 50, 60],
    }
)


def both():
    return mpd.DataFrame(PDF.copy()), PDF.copy()


def eq_pd(got, want, reset=True):
    if reset:
        got, want = got.reset_index(drop=True), want.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_index_type=False)


def eq_ser(got, want):
    pd.testing.assert_series_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_index_type=False, check_names=False,
    )


def test_interpolate_limit_direction():
    m, p = both()
    for ld in ("forward", "backward", "both"):
        fn = lambda df: df.assign(c2=[None, None, 2.0, None, 4.0, None])[["c2"]].interpolate(limit_direction=ld)
        eq_pd(fn(m).to_pandas(), fn(p))


def test_pct_change_fill_method_none():
    m, p = both()
    fn = lambda df: df[["c"]].pct_change(fill_method=None)
    eq_pd(fn(m).to_pandas(), fn(p))
    eq_ser(m["c"].pct_change(fill_method=None).to_pandas(), p["c"].pct_change(fill_method=None))


def test_diff_axis1():
    m, p = both()
    fn = lambda df: df[["c", "d"]].diff(axis=1)
    eq_pd(fn(m).to_pandas(), fn(p))


def test_skew_axis1():
    m, p = both()
    gm, gp = m[["a", "c", "d"]].skew(axis=1).to_pandas(), p[["a", "c", "d"]].skew(axis=1)
    eq_ser(gm, gp)


def test_mode_axis1():
    m, p = both()
    fn = lambda df: df.assign(e=lambda x: x["a"])[["a", "e", "d"]].mode(axis=1).fillna(-1)
    eq_pd(fn(m).to_pandas(), fn(p))


def test_min_count_sum_prod():
    m, p = both()
    assert pd.isna(m.head(0)[["d"]].prod(min_count=1)["d"])
    assert pd.isna(p.head(0)[["d"]].prod(min_count=1)["d"])
    gm = m.assign(c2=[None] * 6).groupby("b")["c2"].sum(min_count=1).reset_index().to_pandas()
    gp = p.assign(c2=[None] * 6).groupby("b")["c2"].sum(min_count=1).reset_index()
    assert gm["c2"].isna().all() and gp["c2"].isna().all()


def test_sem_std_var_ddof():
    m, p = both()
    assert abs(m["d"].sem(ddof=0) - p["d"].sem(ddof=0)) < 1e-9
    assert abs(m["d"].std(ddof=2) - p["d"].std(ddof=2)) < 1e-9
    assert abs(m["d"].var(ddof=0) - p["d"].var(ddof=0)) < 1e-9
    pd.testing.assert_series_equal(
        m[["c", "d"]].sem(ddof=0), p[["c", "d"]].sem(ddof=0), check_dtype=False
    )


def test_filtered_default_index_preserves_labels():
    """pandas keeps ORIGINAL positional labels through dropna/boolean masks;
    the order_is_position invariant recovers them with no position shuffle."""
    m, p = both()
    assert list(m.dropna(subset=["c"]).to_pandas().index) == list(p.dropna(subset=["c"]).index)
    assert list(m[m.a > 1].to_pandas().index) == list(p[p.a > 1].index)
    # unfiltered and head() stay RangeIndex
    assert isinstance(m.to_pandas().index, pd.RangeIndex)
    assert isinstance(m.head(3).to_pandas().index, pd.RangeIndex)
    # sort re-derives order: back to positional renumbering on materialize
    assert isinstance(m.sort_values("d").to_pandas().index, pd.RangeIndex)


def test_idxmax_after_dropna():
    m, p = both()
    gm = m.dropna(subset=["c"]).groupby("b")["c"].idxmax().sort_values().to_pandas()
    gp = p.dropna(subset=["c"]).groupby("b")["c"].idxmax().sort_values()
    assert list(gm) == list(gp) == [3, 4, 5]
    assert m[m.a > 1]["d"].idxmax() == p[p.a > 1]["d"].idxmax()


def test_apply_axis1_result_type_expand():
    m, p = both()
    fn = lambda df: df.apply(lambda r: [r["d"], r["d"] * 2], axis=1, result_type="expand")
    eq_pd(fn(m).to_pandas(), fn(p))


def test_qcut_duplicates_drop():
    m, p = both()
    sm = mpd.qcut(m.assign(e=[1, 1, 1, 1, 2, 3])["e"], 3, duplicates="drop", labels=False)
    sp = pd.qcut(p.assign(e=[1, 1, 1, 1, 2, 3])["e"], 3, duplicates="drop", labels=False)
    eq_ser(sm.to_pandas(), sp)
    with pytest.raises(ValueError):
        mpd.qcut(m.assign(e=[1, 1, 1, 1, 2, 3])["e"], 3, labels=False)


def test_cut_include_lowest():
    m, p = both()
    sm = mpd.cut(m["d"], [10, 30, 60], include_lowest=True, labels=False)
    sp = pd.cut(p["d"], [10, 30, 60], include_lowest=True, labels=False)
    eq_ser(sm.to_pandas(), sp)


def test_drop_index_and_columns_together():
    m, p = both()
    fn = lambda df: df.drop(index=[0, 2], columns=["b"])
    eq_pd(fn(m).to_pandas(), fn(p))


def test_update_overwrite_false():
    m, p = both()

    def fn(df):
        x = df[["c", "d"]]
        x.update(type(x)({"c": [9.0] * 6}), overwrite=False)
        return x

    eq_pd(fn(m).to_pandas(), fn(p))


def test_where_mask_callable():
    m, p = both()
    eq_pd(m[["d"]].where(lambda x: x > 25, -1).to_pandas(), p[["d"]].where(lambda x: x > 25, -1))
    eq_pd(m[["d"]].mask(lambda x: x > 25, -1).to_pandas(), p[["d"]].mask(lambda x: x > 25, -1))


def test_squeeze_axis1():
    m, p = both()
    eq_ser(m[["d"]].squeeze(axis=1).to_pandas(), p[["d"]].squeeze(axis=1))


def test_transpose_typed_int_columns():
    m, p = both()
    gm = m.head(2)[["a", "d"]].swapaxes(0, 1).to_pandas()
    gp = p.head(2)[["a", "d"]].swapaxes(0, 1)
    assert list(gm.columns) == list(gp.columns) == [0, 1]


def test_to_numeric_downcast():
    m, p = both()
    sm = mpd.to_numeric(m["d"], downcast="integer").to_pandas()
    sp = pd.to_numeric(p["d"], downcast="integer")
    assert list(sm) == list(sp)
