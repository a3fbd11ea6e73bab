"""Probe wave 53 (round 12): pd.IndexSlice row keys (conjunctive
level-column filters), loc full-depth tuple returns the row Series (unique
match) / KeyError (no match), reset_index pandas positional order
(level first), Grouper(level=) mixed with column keys."""

import pandas as pd
import pytest

import modin_spark.pandas as mpd


def _pair():
    d = {"g": ["x", "x", "y", "y"], "h": ["p", "q", "p", "q"],
         "a": [1.0, 2.0, 3.0, 4.0]}
    return (pd.DataFrame(d).set_index(["g", "h"]),
            mpd.DataFrame(d).set_index(["g", "h"]))


def _eqf(got, exp):
    pd.testing.assert_frame_equal(got.to_pandas() if hasattr(got, "to_pandas") else got,
                                  exp, check_dtype=False, check_index_type=False)


def _eqs(got, exp):
    pd.testing.assert_series_equal(got.to_pandas() if hasattr(got, "to_pandas") else got,
                                   exp, check_dtype=False, check_index_type=False)


def test_index_slice():
    P, M = _pair()
    idx = pd.IndexSlice
    _eqf(M.loc[idx[:, "p"], :], P.loc[idx[:, "p"], :])
    _eqf(M.loc[idx[["x"], :], :], P.loc[idx[["x"], :], :])
    _eqs(M.loc[idx[:, "q"], "a"], P.loc[idx[:, "q"], "a"])
    _eqf(M.sort_index().loc[idx["x":"y", ["p"]], :],
         P.sort_index().loc[idx["x":"y", ["p"]], :])


def test_loc_full_tuple_row_series():
    P, M = _pair()
    _eqs(M.loc[("x", "p")], P.loc[("x", "p")])
    _eqf(M.loc[("x",)], P.loc[("x",)])
    with pytest.raises(KeyError):
        M.loc[("zz", "p")]


def test_reset_index_positional_level():
    P, M = _pair()
    _eqf(M.reset_index(["h"]), P.reset_index(["h"]))
    _eqf(M.reset_index("g"), P.reset_index("g"))
    _eqf(M.reset_index(drop=True), P.reset_index(drop=True))


def test_grouper_level_mixed_with_column():
    P, M = _pair()
    _eqs(M.reset_index("h").groupby([mpd.Grouper(level="g"), "h"])["a"].sum(),
         P.reset_index("h").groupby([pd.Grouper(level="g"), "h"])["a"].sum())


def test_loc_gap_label_enlargement():
    m = mpd.DataFrame({"a": [1.0, 2.0]})
    m.loc[5, "a"] = 9.0
    p = pd.DataFrame({"a": [1.0, 2.0]})
    p.loc[5, "a"] = 9.0
    _eqf(m, p)


def test_join_suffix_rules():
    L = pd.DataFrame({"t": [1, 3], "g": ["x", "x"], "v": [1.0, 2]})
    R = pd.DataFrame({"t": [2, 3], "g": ["y", "x"], "w": [10.0, 20]})
    ML, MR = mpd.DataFrame(L), mpd.DataFrame(R)
    for kw in (dict(lsuffix="_l"), dict(rsuffix="_r"), dict(lsuffix="_l", rsuffix="_r")):
        exp = L.set_index("t").join(R.set_index("t"), how="outer", **kw)
        got = ML.set_index("t").join(MR.set_index("t"), how="outer", **kw).to_pandas()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_index_type=False)
    with pytest.raises(ValueError):
        ML.set_index("t").join(MR.set_index("t"))


def test_shift_list_periods():
    P = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]})
    M = mpd.DataFrame(P)
    for kw in (dict(periods=[1, 2]), dict(periods=[1], suffix="_lag"),
               dict(periods=[-1, 1])):
        pd.testing.assert_frame_equal(M.shift(**kw).to_pandas(), P.shift(**kw),
                                      check_dtype=False, check_index_type=False)
    pd.testing.assert_frame_equal(mpd.Series([1.0, 2.0, 3.0]).shift([1, 2]).to_pandas(),
                                  pd.Series([1.0, 2.0, 3.0]).shift([1, 2]),
                                  check_dtype=False, check_index_type=False)


def test_io_reader_writer_tail(tmp_path):
    import sqlite3

    P = pd.DataFrame({"g": ["x", "y", "z"], "a": [1.0, 2.0, 3.0]})
    orc = str(tmp_path / "t.orc")
    P.to_orc(orc)
    got = mpd.read_orc(orc, columns=["a"]).to_pandas()
    assert list(got.columns) == ["a"] and sorted(got.a) == [1.0, 2.0, 3.0]
    con = sqlite3.connect(str(tmp_path / "t.db"))
    mpd.DataFrame(P).to_sql("t2", con, index=False)
    assert pd.read_sql("select count(*) n from t2", con).n[0] == 3
