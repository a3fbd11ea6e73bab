"""Round-9 probe wave 13 regressions (tools/probe_wave13.py): each case
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
        "s": ["foo bar", "baz", "qux quux", "corge", "grault g", "garply"],
    }
)


def both():
    return mpd.DataFrame(PDF.copy()), PDF.copy()


def eq_pd(got, want):
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_index_type=False, check_column_type=False,
    )


def eq_ser(got, want):
    pd.testing.assert_series_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_index_type=False, check_names=False,
    )


def test_idxmax_idxmin_tie_break_first_occurrence():
    """max_by/min_by alone pick an arbitrary tied row; pandas picks the
    FIRST. The (value, ±position) struct key pins it."""
    m, p = both()
    me = m.assign(e=[1, 5, 5, 2, 5, 1])["e"]
    pe = p.assign(e=[1, 5, 5, 2, 5, 1])["e"]
    assert me.idxmax() == pe.idxmax() == 1
    mn = m.assign(e=[5, 1, 1, 2, 1, 5])["e"]
    pn = p.assign(e=[5, 1, 1, 2, 1, 5])["e"]
    assert mn.idxmin() == pn.idxmin() == 1
    # groupby flavor: first occurrence within each group
    gm = m.assign(e=[1, 5, 5, 5, 5, 1]).groupby("b")["e"].idxmax().sort_values().to_pandas()
    gp = p.assign(e=[1, 5, 5, 5, 5, 1]).groupby("b")["e"].idxmax().sort_values()
    assert list(gm) == list(gp)


def test_last_valid_index_after_filter():
    m, p = both()
    assert m[m["a"] > 1]["c"].last_valid_index() == p[p["a"] > 1]["c"].last_valid_index()
    assert m[m["a"] > 1]["c"].first_valid_index() == p[p["a"] > 1]["c"].first_valid_index()


def test_assign_datetime_index_and_dt_round():
    m, p = both()
    t = pd.date_range("2024-01-01 00:07", periods=6, freq="37min")
    eq_ser(m.assign(t=t)["t"].dt.round("15min").to_pandas(), p.assign(t=t)["t"].dt.round("15min"))
    eq_ser(m.assign(t=t)["t"].dt.floor("h").to_pandas(), p.assign(t=t)["t"].dt.floor("h"))
    tz = pd.date_range("2024-01-01", periods=6, freq="D", tz="UTC")
    eq_ser(m.assign(t=tz)["t"].dt.tz_localize(None).to_pandas(),
           p.assign(t=tz)["t"].dt.tz_localize(None))


def test_str_rsplit_expand():
    m, p = both()
    fn = lambda df: df["s"].str.rsplit(" ", n=1, expand=True).fillna("-")
    eq_pd(fn(m).to_pandas(), fn(p))


def test_groupby_ngroup_descending():
    m, p = both()
    gm = m.groupby("b").ngroup(ascending=False).sort_values().to_pandas()
    gp = p.groupby("b").ngroup(ascending=False).sort_values()
    assert list(gm) == list(gp)


def test_crosstab_normalize_index_columns_typed_labels():
    m, p = both()
    for norm in ("index", "columns"):
        gm = mpd.crosstab(m["b"], m["a"], normalize=norm).to_pandas().sort_index()
        gp = pd.crosstab(p["b"], p["a"], normalize=norm).sort_index()
        assert list(gm.columns) == list(gp.columns)  # typed int labels
        assert gm.columns.name == gp.columns.name == "a"
        assert np.allclose(gm.values, gp.values)
    # margins still exact counts (normalize=False must not false-match 0)
    gm = mpd.crosstab(m["b"], m["a"], margins=True).to_pandas().sort_index()
    gp = pd.crosstab(p["b"], p["a"], margins=True).sort_index()
    assert gm.values.tolist() == gp.values.tolist()


def test_cov_ddof_nan_free():
    # pandas' masked cov kernel IGNORES ddof when NaNs are present (2.2.2);
    # ours honors it uniformly — parity asserted on the NaN-free path only
    m, p = both()
    gm = m[["a", "d"]].astype(float).cov(ddof=0)
    gp = p[["a", "d"]].astype(float).cov(ddof=0)
    assert np.allclose(gm.values, gp.values)


def test_searchsorted_vector():
    m, p = both()
    assert list(m["d"].searchsorted([15, 35])) == list(p["d"].searchsorted([15, 35]))


def test_join_on_column_key():
    m, p = both()
    fn = lambda df: df.join(df.groupby("b")["d"].sum().rename("t"), on="b").sort_values(list(df.columns) + ["t"]).reset_index(drop=True)
    eq_pd(fn(m).to_pandas()[["b", "d", "t"]], fn(p)[["b", "d", "t"]])


def test_add_frame_fill_value_missing_column():
    m, p = both()
    fn = lambda df: df[["c", "d"]].add(df[["c"]], fill_value=0)
    eq_pd(fn(m).to_pandas().sort_values(["c", "d"]).reset_index(drop=True),
          fn(p).sort_values(["c", "d"]).reset_index(drop=True))
