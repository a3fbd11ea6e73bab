"""Probe wave 25 (round 11): tz-aware materialization + string rendering,
stack(dropna=). Each diverged before the fix (tools/probe_wave25.py, 28
green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


@pytest.fixture()
def pdf():
    return pd.DataFrame({"a": [1.0, np.nan, 3.0, 4.0],
                         "b": [np.nan, 2.0, np.nan, 5.0],
                         "t": pd.date_range("2024-01-01", periods=4, freq="h")})


def test_tz_convert_astype_str_has_offset(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf.t.dt.tz_localize("UTC").dt.tz_convert("US/Eastern").astype(str).tolist()
    got = m.t.dt.tz_localize("UTC").dt.tz_convert("US/Eastern").astype(str).to_pandas().tolist()
    assert got == want  # includes the -05:00 offset suffix


def test_tz_convert_dst_offset():
    # across the March DST jump the per-row offset flips -05:00 -> -04:00
    p = pd.DataFrame({"t": pd.to_datetime(["2024-03-10 06:00", "2024-03-10 07:30"])})
    m = mpd.from_pandas(p)
    want = p.t.dt.tz_localize("UTC").dt.tz_convert("US/Eastern").astype(str).tolist()
    got = m.t.dt.tz_localize("UTC").dt.tz_convert("US/Eastern").astype(str).to_pandas().tolist()
    assert got == want
    assert got[0].endswith("-05:00") and got[1].endswith("-04:00")


def test_tz_aware_materialization_dtype(pdf):
    m = mpd.from_pandas(pdf)
    s = m.t.dt.tz_localize("UTC").to_pandas()
    want = pdf.t.dt.tz_localize("UTC")
    assert str(s.dtype) == str(want.dtype)
    assert s.astype(str).tolist() == want.astype(str).tolist()


def test_stack_dropna_false(pdf):
    m = mpd.from_pandas(pdf)
    want = pdf[["a", "b"]].stack(dropna=False)
    got = m[["a", "b"]].stack(dropna=False).to_pandas()
    assert got.shape == want.shape
    assert got.fillna(-9).tolist() == want.fillna(-9).tolist()
    # default still drops
    assert m[["a", "b"]].stack().to_pandas().shape == pdf[["a", "b"]].stack().shape
