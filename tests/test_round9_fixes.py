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
