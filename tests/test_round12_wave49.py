"""Probe wave 49 (round 12): anchored pandas offsets (MonthEnd, QuarterEnd,
Week(weekday=), ...) on datetime Series via one Arrow-vectorized batch —
calendar roll semantics no interval literal expresses."""

import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.mark.parametrize("off", [
    pd.offsets.MonthEnd(1), pd.offsets.MonthBegin(2), pd.offsets.QuarterEnd(),
    pd.offsets.YearBegin(), pd.offsets.Week(weekday=0), pd.offsets.BMonthEnd(),
])
def test_anchored_offsets(off):
    ts = pd.Series(pd.date_range("2024-01-31", periods=3, freq="15D"))
    Mt = mpd.Series(ts)
    assert (Mt + off).to_pandas().tolist() == (ts + off).tolist()
    assert (Mt - off).to_pandas().tolist() == (ts - off).tolist()


def test_plain_dateoffset_stays_interval():
    ts = pd.Series(pd.date_range("2024-01-31", periods=3, freq="15D"))
    Mt = mpd.Series(ts)
    assert (Mt + pd.DateOffset(days=3)).to_pandas().tolist() == (ts + pd.DateOffset(days=3)).tolist()


def _eqf(got, exp):
    pd.testing.assert_frame_equal(got.to_pandas(), exp, check_dtype=False,
                                  check_index_type=False)


def test_to_csv_string_form():
    P = pd.DataFrame({"g": ["x", "y"], "a": [1.5, None],
                      "t": pd.date_range("2024-01-01", periods=2)})
    M = mpd.DataFrame(P)
    for kw in (dict(index=False, na_rep="NULL"), dict(index=False, float_format="%.1f"),
               dict(index=False, sep=";"), dict(index=False, date_format="%Y%m%d"),
               dict(index=False, header=False), dict(index=False, columns=["a"]), dict()):
        assert M.to_csv(**kw) == P.to_csv(**kw), kw
    assert M["a"].to_csv(index=False) == P["a"].to_csv(index=False)


def test_indexing_edge_surface():
    P = pd.DataFrame({"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, 3.0, 4.0]})
    M = mpd.DataFrame({"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, 3.0, 4.0]})
    # boolean mask list through loc
    _eqf(M.loc[[True, False, True, False]], P.loc[[True, False, True, False]])
    # negative-step iloc slices
    _eqf(M.iloc[::-1], P.iloc[::-1])
    _eqf(M.iloc[::-2], P.iloc[::-2])
    _eqf(M.iloc[3:0:-1, 1:], P.iloc[3:0:-1, 1:])
    # loc[list] returns rows in the order of the KEYS
    _eqf(M.loc[[2, 0]], P.loc[[2, 0]])
    _eqf(M.loc[[3, 1], ["a"]], P.loc[[3, 1], ["a"]])
    pd.testing.assert_series_equal(M["a"].loc[[2, 0]].to_pandas(), P["a"].loc[[2, 0]],
                                   check_dtype=False, check_index_type=False)
    _eqf(M.set_index("g").loc[["y"]], P.set_index("g").loc[["y"]])
