"""Probe wave 23 (round 11): DateOffset arithmetic, timedelta/timedelta
ratio, rolling.apply pandas semantics (raw=False default, NaN-inclusive
windows), extension-dtype materialization, align outer row padding. Each
raised or diverged before the fix (tools/probe_wave23.py, 33 green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({
        "a": [3.0, 1.0, 2.0, 5.0, 4.0],
        "t": pd.date_range("2024-01-01 00:17", periods=5, freq="7h13min"),
        "t2": pd.date_range("2024-02-01", periods=5, freq="D"),
    })


def test_dateoffset_arithmetic(pdf):
    m = mpd.from_pandas(pdf)
    for off in (pd.DateOffset(months=1), pd.DateOffset(years=1, days=3),
                pd.DateOffset(hours=5, minutes=30)):
        want_sub = (pdf.t - off).astype(str).tolist()
        got_sub = (m.t - off).astype(str).to_pandas().tolist()
        assert got_sub == want_sub
        want_add = (pdf.t + off).astype(str).tolist()
        got_add = (m.t + off).astype(str).to_pandas().tolist()
        assert got_add == want_add


def test_timedelta_ratio_exact_to_microseconds(pdf):
    m = mpd.from_pandas(pdf)
    want = ((pdf.t2 - pdf.t) / pd.Timedelta("1h")).tolist()
    got = ((m.t2 - m.t) / pd.Timedelta("1h")).to_pandas().tolist()
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_rolling_apply_series_arg_and_nan_windows():
    p = pd.Series([3.0, 1.0, np.nan, 5.0, 4.0], name="x")
    m = mpd.from_pandas(p.to_frame())["x"]
    # raw=False default: func gets a pandas Series
    want = p.rolling(2, min_periods=1).apply(lambda s: s.iloc[-1] - s.iloc[0]).tolist()
    got = m.rolling(2, min_periods=1).apply(lambda s: s.iloc[-1] - s.iloc[0]).to_pandas().tolist()
    assert all((a == b) or (pd.isna(a) and pd.isna(b)) for a, b in zip(got, want))
    # NaN-inclusive windows: np.median over a NaN window is NaN (pandas),
    # NOT the median of the stripped values
    want2 = p.rolling(2).apply(np.median, raw=True).tolist()
    got2 = m.rolling(2).apply(np.median, raw=True).to_pandas().tolist()
    assert all((a == b) or (pd.isna(a) and pd.isna(b)) for a, b in zip(got2, want2))


def test_extension_dtype_materialization(pdf):
    m = mpd.from_pandas(pd.DataFrame({"k": ["x", None, "y"], "n": [1, 2, 3]}))
    s = m.k.astype("string").to_pandas()
    assert str(s.dtype) == "string" and s.isna().tolist() == [False, True, False]
    i = m.n.astype("Int64").to_pandas()
    assert str(i.dtype) == "Int64"
    cd = m.convert_dtypes().to_pandas()
    assert str(cd.n.dtype) == "Int64"


def test_align_outer_pads_rows(pdf):
    m = mpd.from_pandas(pdf)
    la, ra = pdf[["a"]].align(pdf[["a", "t"]].head(3), join="outer")
    lm, rm = m[["a"]].align(m[["a", "t"]].head(3), join="outer")
    assert (lm.to_pandas().shape, rm.to_pandas().shape) == (la.shape, ra.shape)
    assert rm.to_pandas()["a"].fillna(-9).tolist() == ra["a"].fillna(-9).tolist()
