"""Cross-frame alignment on non-contiguous ORDER_COL.

Frames that went through a sort (or a parquet read spanning >1 partition)
carry partition-major ORDER_COL values (partition p starts at p<<33), NOT
contiguous 0..n-1.  Aligning such a frame with an unrelated frame must go
through contiguous global positions, never raw ORDER_COL equality
(reference semantics: modin/pandas align on the index; default RangeIndex
means positional alignment).
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def sorted_mdf(spark):
    """A multi-partition frame whose ORDER_COL is partition-major (post-sort
    re-derivation on 32 shuffle partitions => ids are NOT 0..n-1)."""
    import modin_spark.pandas as mpd

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"a": rng.permutation(1000), "b": rng.random(1000)})
    mdf = mpd.from_pandas(pdf).sort_values("a")
    ppdf = pdf.sort_values("a").reset_index(drop=True)
    return mdf, ppdf


def test_setitem_list_after_sort(sorted_mdf):
    mdf, ppdf = sorted_mdf
    mdf["x"] = list(range(1000))
    out = mdf.to_pandas()
    assert out["x"].notna().all()
    np.testing.assert_array_equal(out["x"].to_numpy(), np.arange(1000))
    np.testing.assert_array_equal(out["a"].to_numpy(), ppdf["a"].to_numpy())


def test_setitem_series_cross_frame(sorted_mdf, spark):
    # pandas aligns a Series value BY LABEL: the sorted frame keeps its
    # ORIGINAL labels, so each row gets value[original_label] (r11 — the
    # earlier positional expectation here was NOT pandas semantics)
    import modin_spark.pandas as mpd

    mdf, ppdf = sorted_mdf
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"a": rng.permutation(1000), "b": rng.random(1000)})
    want = pdf.sort_values("a")
    want["x"] = pd.Series(np.arange(1000) * 2.0)
    other = mpd.from_pandas(pd.DataFrame({"v": np.arange(1000) * 2.0}))
    mdf["x"] = other["v"]
    out = mdf.to_pandas()
    assert out["x"].notna().all()
    np.testing.assert_allclose(out["x"].to_numpy(), want["x"].to_numpy())


def test_series_combine_cross_frame(sorted_mdf, spark):
    import modin_spark.pandas as mpd

    mdf, ppdf = sorted_mdf
    other = mpd.from_pandas(pd.DataFrame({"v": np.ones(1000)}))
    s = mdf["b"] + other["v"]
    out = s.to_pandas()
    assert len(out) == 1000
    np.testing.assert_allclose(np.sort(out.to_numpy()), np.sort(ppdf["b"].to_numpy() + 1.0))


def test_mask_cross_frame(sorted_mdf, spark):
    # pandas reindexes a boolean-Series key to the frame's LABELS: rows with
    # original label < 10 survive (r11 — was positional before, not pandas)
    import modin_spark.pandas as mpd

    mdf, ppdf = sorted_mdf
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"a": rng.permutation(1000), "b": rng.random(1000)})
    want = pdf.sort_values("a")[pd.Series(np.arange(1000) < 10)]
    mask_src = mpd.from_pandas(pd.DataFrame({"m": np.arange(1000) < 10}))
    out = mdf[mask_src["m"]].to_pandas()
    assert len(out) == 10
    np.testing.assert_array_equal(np.sort(out["a"].to_numpy()), np.sort(want["a"].to_numpy()))
