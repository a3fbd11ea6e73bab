"""Round-9 fixes: probe wave 10 kwarg long tail (each probe diffed against
real pandas before the fix), plus the star-expansion bucket guard tested in
test_pipeline_ops.py."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

PDF = pd.DataFrame(
    {
        "a": [3, 1, 2, 1, 3, None],
        "b": ["x", "y", "x", "z", "y", "x"],
        "c": [1.5, 2.5, 3.5, 4.5, 5.5, 6.5],
        "d": [10, 20, 30, 40, 50, 60],
    }
)


def both():
    return mpd.DataFrame(PDF.copy()), PDF.copy()


def eq_frames(got, want):
    pd.testing.assert_frame_equal(
        got.to_pandas().reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
        check_index_type=False,
    )


def test_reset_index_names():
    m, p = both()
    eq_frames(
        m.set_index("b").reset_index(names="bee").sort_values("d"),
        p.set_index("b").reset_index(names="bee").sort_values("d"),
    )
    # multi-level
    eq_frames(
        m.set_index(["b", "a"]).reset_index(names=["bee", "aye"]).sort_values("d"),
        p.set_index(["b", "a"]).reset_index(names=["bee", "aye"]).sort_values("d"),
    )
    with pytest.raises(ValueError):
        m.set_index(["b", "a"]).reset_index(names=["only_one"])


def test_astype_errors_ignore_keeps_unconvertible():
    m, p = both()
    eq_frames(
        m[["b", "d"]].astype(int, errors="ignore"),
        p[["b", "d"]].astype(int, errors="ignore"),
    )
    # convertible columns still convert
    out = m[["d"]].astype("float64", errors="ignore").to_pandas()
    assert out["d"].dtype == np.float64


def test_cut_right_false_int_bins():
    m, p = both()
    got = mpd.cut(m["c"], 3, labels=False, right=False).to_pandas()
    want = pd.cut(p["c"], 3, labels=False, right=False)
    assert list(got) == list(want)
    # right=True unchanged
    got = mpd.cut(m["c"], 3, labels=False).to_pandas()
    want = pd.cut(p["c"], 3, labels=False)
    assert list(got) == list(want)


def test_series_corr_min_periods():
    m, p = both()
    assert m["c"].corr(m["d"], min_periods=3) == pytest.approx(
        p["c"].corr(p["d"], min_periods=3)
    )
    assert np.isnan(m["c"].corr(m["d"], min_periods=100))
    assert np.isnan(
        m["c"].corr(m["d"], method="spearman", min_periods=100)
    )


def test_frame_replace_regex():
    m, p = both()
    eq_frames(
        m.replace({"^x$": "XX"}, regex=True).sort_values("d"),
        p.replace({"^x$": "XX"}, regex=True).sort_values("d"),
    )


def test_insert_allow_duplicates():
    m, p = both()
    mm, pp = m[["d", "c"]], p[["d", "c"]]
    with pytest.raises(ValueError):
        mm.insert(1, "d", 7)
    mm.insert(1, "d", mm["d"] * 0 + 7, allow_duplicates=True)
    pp.insert(1, "d", pp["d"] * 0 + 7, allow_duplicates=True)
    assert list(mm.columns) == list(pp.columns) == ["d", "d", "c"]
    got = mm.to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pp.reset_index(drop=True), check_dtype=False)


def test_to_datetime_format_mixed():
    m, p = both()
    ser_m = m["b"].radd("2021-01-0").where(m["d"] < 40, "2021-02-01")
    ser_p = p["b"].radd("2021-01-0").where(p["d"] < 40, "2021-02-01")
    got = mpd.to_datetime(ser_m, errors="coerce", format="mixed").to_pandas()
    want = pd.to_datetime(ser_p, errors="coerce", format="mixed")
    assert list(got.isna()) == list(want.isna())
    assert list(got.dropna()) == list(want.dropna())


def test_sort_index_level_and_ascending_list():
    m, p = both()
    eq_frames(
        m.set_index(["b", "a"]).sort_index(ascending=[False, True], level=[0, 1]).reset_index(),
        p.set_index(["b", "a"]).sort_index(ascending=[False, True], level=[0, 1]).reset_index(),
    )
    # single level with sort_remaining
    eq_frames(
        m.set_index(["b", "a"]).sort_index(level="b", ascending=False).reset_index(),
        p.set_index(["b", "a"]).sort_index(level="b", ascending=False).reset_index(),
    )


# ---------------------------------------------------------------- wave 11
# (tools/probe_wave11.py — each diverged or errored vs pandas before the fix)

WPDF = pd.DataFrame(
    {
        "a": [3, 1, 2, 1, 3, 2],
        "b": ["x", "y", "x", "z", "y", "x"],
        "c": [1.5, 2.5, 3.5, 4.5, 5.5, 6.5],
        "d": [10, 20, 30, 40, 50, 60],
    }
)


def wboth():
    return mpd.DataFrame(WPDF.copy()), WPDF.copy()


def _srt(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def eq_pd(got, want):
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_index_type=False,
    )


def test_unstack_fill_value_only_absent_cells():
    m, p = wboth()
    fn = lambda df: df.groupby(["b", "a"])["d"].sum().unstack(fill_value=-1).reset_index()
    eq_pd(_srt(fn(m).to_pandas()), _srt(fn(p)))


def test_stack_level0_of_two():
    m, p = wboth()
    fn = lambda df: (
        df.set_index(["b", "a"]).groupby(level=[0, 1]).sum()
        .unstack(0).stack(0, future_stack=True).reset_index().fillna(-9)
    )
    eq_pd(_srt(fn(m).to_pandas()), _srt(fn(p)))


def test_eval_multi_assign():
    m, p = wboth()
    fn = lambda df: df.eval("e = c + d\nf = c * 2")
    eq_pd(_srt(fn(m).to_pandas()), _srt(fn(p)))
    with pytest.raises(ValueError):
        m.eval("e = c + d\nc * 2")


def test_pivot_columns_only_positional_index():
    m, p = wboth()
    fn = lambda df: df.head(3).pivot(columns="b", values="d").fillna(-1).reset_index(drop=True)
    eq_pd(_srt(fn(m).to_pandas()), _srt(fn(p)))


def test_pivot_table_typed_keys_and_columns_name():
    m, p = wboth()
    gm = m.pivot_table(values="d", index="b", columns="a", aggfunc="sum").to_pandas()
    gp = p.pivot_table(values="d", index="b", columns="a", aggfunc="sum")
    assert list(gm.columns) == list(gp.columns)  # typed (int) labels, not strings
    assert gm.columns.name == gp.columns.name == "a"


def test_cumsum_skipna_false_poisons_after_first_nan():
    m, p = wboth()
    for kind in ("cumsum", "cummax", "cumprod"):
        sm = getattr(m.assign(c2=[1.0, None, 2.0, None, 3.0, 4.0])["c2"], kind)(skipna=False)
        sp = getattr(p.assign(c2=[1.0, None, 2.0, None, 3.0, 4.0])["c2"], kind)(skipna=False)
        pd.testing.assert_series_equal(
            sm.to_pandas().reset_index(drop=True), sp.reset_index(drop=True),
            check_dtype=False, check_names=False,
        )


def test_groupby_cumcount_descending():
    m, p = wboth()
    sm = m.groupby("b").cumcount(ascending=False).sort_values().to_pandas()
    sp = p.groupby("b").cumcount(ascending=False).sort_values()
    assert list(sm) == list(sp)


def test_truncate_positional_index():
    m, p = wboth()
    fn = lambda df: df.truncate(before=1, after=4).reset_index(drop=True)
    eq_frames(fn(m), fn(p))


def test_reset_index_preserves_columns_name():
    m, p = wboth()
    gm = m.pivot_table(values="d", index="b", columns="a", aggfunc="sum").reset_index().to_pandas()
    gp = p.pivot_table(values="d", index="b", columns="a", aggfunc="sum").reset_index()
    assert gm.columns.name == gp.columns.name == "a"


def test_fillna_preserves_columns_name():
    m, p = wboth()
    gm = m.pivot_table(values="d", index="b", columns="a", aggfunc="sum").fillna(0).to_pandas()
    gp = p.pivot_table(values="d", index="b", columns="a", aggfunc="sum").fillna(0)
    assert gm.columns.name == gp.columns.name == "a"
