"""Probe wave 34 (round 11 closer): object-dtype describe shape,
Series.add_prefix/suffix index labels. (tools/probe_wave34.py, 16 green)."""

import numpy as np
import pandas as pd

import modin_spark.pandas as mpd


def test_series_describe_object_dtype():
    p = pd.Series(["x", "y", "x", None, "z"], name="k")
    m = mpd.from_pandas(p.to_frame())["k"]
    want = p.describe()
    got = m.describe()
    assert list(got.index) == list(want.index) == ["count", "unique", "top", "freq"]
    assert got["count"] == want["count"] and got["unique"] == want["unique"]
    assert got["top"] == want["top"] and got["freq"] == want["freq"]
    # numeric path unchanged
    pn = pd.Series([1.0, 2.0, 3.0], name="v")
    mn = mpd.from_pandas(pn.to_frame())["v"]
    assert list(mn.describe().index) == list(pn.describe().index)


def test_series_add_prefix_suffix_index():
    p = pd.Series([1, 2], name="v")
    m = mpd.from_pandas(p.to_frame())["v"]
    assert list(m.add_prefix("i").to_pandas().index) == list(p.add_prefix("i").index)
    assert list(m.add_suffix("_x").to_pandas().index) == list(p.add_suffix("_x").index)
