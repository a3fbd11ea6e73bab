"""Round-9 probe wave 15 regressions (tools/probe_wave15.py): each case
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
        "s": ["Foo bar", None, "qux1 Quux", "corge", "grault g7", "garply"],
    }
)


def both():
    return mpd.DataFrame(PDF.copy()), PDF.copy()


def eq_ser(got, want):
    pd.testing.assert_series_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_index_type=False, check_names=False,
    )


def test_str_startswith_endswith_tuple():
    m, p = both()
    eq_ser(m["s"].str.startswith(("Fo", "qu"), na=False).to_pandas(),
           p["s"].str.startswith(("Fo", "qu"), na=False))
    eq_ser(m["s"].str.endswith(("bar", "x"), na=False).to_pandas(),
           p["s"].str.endswith(("bar", "x"), na=False))


def test_numpy_ufunc_protocol():
    m, p = both()
    eq_ser(np.sqrt(m["d"]).to_pandas(), np.sqrt(p["d"]))
    eq_ser(np.log1p(m["c"]).to_pandas(), np.log1p(p["c"]))
    gm = np.abs(m[["c", "d"]] * -1).to_pandas()
    gp = np.abs(p[["c", "d"]] * -1)
    pd.testing.assert_frame_equal(gm.reset_index(drop=True), gp.reset_index(drop=True),
                                  check_dtype=False)
    eq_ser(np.floor(m["c"] * 1.7).to_pandas(), np.floor(p["c"] * 1.7))


def test_reindex_rows_fill_value():
    m, p = both()
    gm = (m.set_index("a")[["d"]].groupby(level=0).sum()
          .reindex([1, 2, 3, 4], fill_value=0).reset_index().to_pandas())
    gp = (p.set_index("a")[["d"]].groupby(level=0).sum()
          .reindex([1, 2, 3, 4], fill_value=0).reset_index())
    pd.testing.assert_frame_equal(gm, gp, check_dtype=False, check_index_type=False)


def test_series_groupby_level():
    m, p = both()
    gm = m.set_index("b")["d"].groupby(level=0).sum().reset_index(drop=True).to_pandas()
    gp = p.set_index("b")["d"].groupby(level=0).sum().reset_index(drop=True)
    assert sorted(gm) == sorted(gp)


def test_take_axis1():
    m, p = both()
    gm = m.take([2, 0], axis=1).to_pandas()
    gp = p.take([2, 0], axis=1)
    pd.testing.assert_frame_equal(gm, gp, check_dtype=False, check_index_type=False)


def test_df_filter():
    m, p = both()
    for kw in ({"items": ["a", "d"]}, {"like": "s"}, {"regex": "^[ab]$"}):
        gm, gp = m.filter(**kw).to_pandas(), p.filter(**kw)
        pd.testing.assert_frame_equal(gm.reset_index(drop=True), gp.reset_index(drop=True),
                                      check_dtype=False, check_index_type=False)


def test_crosstab_normalize_columns_broadcast_plan():
    # values exact AND the plan carries a broadcast (not a global window)
    m, p = both()
    gm = mpd.crosstab(m["b"], m["a"], normalize="columns").to_pandas().sort_index()
    gp = pd.crosstab(p["b"], p["a"], normalize="columns").sort_index()
    assert np.allclose(gm.values, gp.values)
