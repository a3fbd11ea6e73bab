"""Probe wave 20 (round 11): axis-metadata setters, at/iat writes,
groupby.shift fill_value, cut retbins, merge_ordered fill_method,
pivot_table margins on the no-columns path. Each case raised or diverged
from pandas before the fix (tools/probe_wave20.py)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({
        "a": [3, 1, 2, 5, 4],
        "b": [1.5, np.nan, 2.5, 0.5, 3.5],
        "k": list("xyxyx"),
    })


def test_index_setter(pdf):
    m = mpd.from_pandas(pdf)
    m.index = [10, 20, 30, 40, 50]
    p = pdf.copy()
    p.index = [10, 20, 30, 40, 50]
    assert list(m.to_pandas().index) == list(p.index)
    assert m.loc[30, "a"] == p.loc[30, "a"]


def test_at_iat_write(pdf):
    p = pdf.copy()
    m = mpd.from_pandas(pdf)
    p.at[2, "a"] = 99
    m.at[2, "a"] = 99
    assert m.to_pandas()["a"].tolist() == p["a"].tolist()
    p.iat[1, 0] = 42
    m.iat[1, 0] = 42
    assert m.to_pandas()["a"].tolist() == p["a"].tolist()


def test_groupby_shift_fill_value(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.groupby("k")["a"].shift(1, fill_value=-1).tolist()
    got = m.groupby("k")["a"].shift(1, fill_value=-1).to_pandas().tolist()
    assert got == want


def test_cut_retbins(pdf):
    m = mpd.from_pandas(pdf)
    want_s, want_b = pd.cut(pdf.a, 2, retbins=True)
    got_s, got_b = mpd.cut(m.a, 2, retbins=True)
    np.testing.assert_allclose(got_b, want_b)
    assert got_s.to_pandas().astype(str).tolist() == want_s.astype(str).tolist()


def test_merge_ordered_fill_method(pdf):
    want = pd.merge_ordered(pdf[["a", "k"]], pdf[["a", "b"]], on="a", fill_method="ffill")
    got = mpd.merge_ordered(
        mpd.from_pandas(pdf[["a", "k"]]), mpd.from_pandas(pdf[["a", "b"]]),
        on="a", fill_method="ffill").to_pandas()
    assert got["b"].fillna(-9).tolist() == want["b"].fillna(-9).tolist()
    # no fill: gaps stay NaN
    got2 = mpd.merge_ordered(
        mpd.from_pandas(pdf[["a", "k"]]), mpd.from_pandas(pdf[["a", "b"]]), on="a").to_pandas()
    want2 = pd.merge_ordered(pdf[["a", "k"]], pdf[["a", "b"]], on="a")
    assert got2["b"].fillna(-9).tolist() == want2["b"].fillna(-9).tolist()


def test_pivot_table_margins_no_columns(pdf):
    m = mpd.from_pandas(pdf)
    want = pd.pivot_table(pdf, values="a", index="k", aggfunc=["sum", "mean"], margins=True)
    got = mpd.pivot_table(m, values="a", index="k", aggfunc=["sum", "mean"], margins=True).to_pandas()
    assert got.values.round(6).tolist() == want.values.round(6).tolist()
    assert list(got.index) == list(want.index)  # ['x', 'y', 'All']


def test_pivot_table_margins_int_index_key():
    # non-string key level: the All label coexists via the stringified level
    p = pd.DataFrame({"g": [1, 1, 2, 2], "v": [1.0, 3.0, 5.0, 7.0]})
    m = mpd.from_pandas(p)
    want = pd.pivot_table(p, values="v", index="g", aggfunc="sum", margins=True)
    got = mpd.pivot_table(m, values="v", index="g", aggfunc="sum", margins=True).to_pandas()
    assert got["v"].tolist() == want["v"].tolist()
    assert [str(i) for i in got.index] == [str(i) for i in want.index]
