"""Probe wave 21 (round 11): map na_action inner guard, transform
list/str dispatch, where/mask callables. Each raised before the fix
(tools/probe_wave21.py swept 42 green cases; these are the fixed three)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def test_series_map_na_action_ignore_callable_never_sees_null():
    p = pd.Series(["a-b", None, "c"], name="s")
    m = mpd.from_pandas(p.to_frame())["s"]
    want = p.map(lambda v: v.upper(), na_action="ignore").tolist()
    got = m.map(lambda v: v.upper(), na_action="ignore").to_pandas().tolist()
    assert got[0] == want[0] and got[2] == want[2] and pd.isna(got[1])


def test_frame_transform_list_and_str():
    p = pd.DataFrame({"a": [-1, 2], "b": [3.5, -4.5]})
    m = mpd.from_pandas(p)
    want = p[["a"]].transform(["abs", "cumsum"])
    got = m[["a"]].transform(["abs", "cumsum"]).to_pandas()
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()
    # single string routes to the method, stays a projection
    assert m.transform("abs").to_pandas().values.tolist() == p.transform("abs").values.tolist()


def test_where_mask_callable():
    p = pd.DataFrame({"a": [3, 1, 2, 5, 4]})
    m = mpd.from_pandas(p)
    assert (m.a.where(lambda v: v > 2, -1).to_pandas().tolist()
            == p.a.where(lambda v: v > 2, -1).tolist())
    assert (m.where(lambda d: d > 2, other=lambda d: -d).to_pandas().a.tolist()
            == p.where(lambda d: d > 2, other=lambda d: -d).a.tolist())
