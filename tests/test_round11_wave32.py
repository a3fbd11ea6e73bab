"""Probe wave 32 (round 11): numpy tail — fancy indexing, where, reshape,
clip, unique — plus error parity. (tools/probe_wave32.py, 23 green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.numpy as mnp
import modin_spark.pandas as mpd


def test_numpy_fancy_index_and_where():
    A = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    MA = mnp.array(A.tolist())
    assert MA[[0, 2]]._to_numpy().tolist() == A[[0, 2]].tolist()
    V = np.array([3.0, 1.0, 2.0])
    MV = mnp.array(V.tolist())
    assert mnp.where(MV > 1.5, MV, -1.0)._to_numpy().tolist() == np.where(V > 1.5, V, -1.0).tolist()
    assert mnp.where(MV > 1.5, -1.0, MV)._to_numpy().tolist() == np.where(V > 1.5, -1.0, V).tolist()
    assert mnp.where(MV > 1.5, 1.0, 0.0)._to_numpy().tolist() == np.where(V > 1.5, 1.0, 0.0).tolist()


def test_numpy_reshape_clip_unique():
    A = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    MA = mnp.array(A.tolist())
    assert MA.reshape(2, 3)._to_numpy().tolist() == A.reshape(2, 3).tolist()
    assert MA.reshape(2, -1)._to_numpy().tolist() == A.reshape(2, -1).tolist()
    V = np.array([3.0, 1.0, 2.0])
    assert mnp.clip(mnp.array(V.tolist()), 1.5, 2.5)._to_numpy().tolist() == np.clip(V, 1.5, 2.5).tolist()
    assert mnp.unique(mnp.array([2, 1, 2]))._to_numpy().tolist() == np.unique([2, 1, 2]).tolist()


def test_error_parity():
    m = mpd.from_pandas(pd.DataFrame({"a": [1, 2]}))
    with pytest.raises(KeyError):
        m["zz"]
    with pytest.raises(Exception):
        m.sort_values("zz")
    assert m.drop(columns=["zz"], errors="ignore").shape == (2, 1)
