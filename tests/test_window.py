"""Order-dependent ops: cumulative, shift/diff, rolling/expanding, rank, ffill."""

import numpy as np
import pandas as pd
import pytest

from tests.conftest import assert_series_equal


@pytest.mark.parametrize("op", ["cumsum", "cummax", "cummin", "cumprod"])
def test_cum_ops(mdf, pdf, op):
    got = getattr(mdf.b, op)()
    ref = getattr(pdf.b, op)()
    assert_series_equal(got, ref)


def test_cum_skipna(mdf, pdf):
    assert_series_equal(mdf.c.cumsum(), pdf.c.cumsum())


@pytest.mark.parametrize("p", [1, 3, -2])
def test_shift(mdf, pdf, p):
    assert_series_equal(mdf.a.shift(p).astype("float64"), pdf.a.shift(p))


def test_diff_pct_change(mdf, pdf):
    assert_series_equal(mdf.b.diff(), pdf.b.diff())
    assert_series_equal(mdf.b.pct_change(), pdf.b.pct_change())


@pytest.mark.parametrize("agg", ["sum", "mean", "min", "max", "std"])
def test_rolling(mdf, pdf, agg):
    got = getattr(mdf.b.rolling(5), agg)()
    ref = getattr(pdf.b.rolling(5), agg)()
    assert_series_equal(got, ref)


def test_rolling_min_periods(mdf, pdf):
    assert_series_equal(mdf.c.rolling(5, min_periods=2).mean(), pdf.c.rolling(5, min_periods=2).mean())


@pytest.mark.parametrize("agg", ["sum", "mean", "min", "max", "count", "std"])
def test_expanding(mdf, pdf, agg):
    got = getattr(mdf.b.expanding(), agg)()
    ref = getattr(pdf.b.expanding(), agg)()
    if agg == "count":
        got = got.astype("float64")
    assert_series_equal(got, ref)


def test_expanding_agg_list(mdf, pdf):
    """Series.expanding().agg([...]) — one block pass, pandas column names."""
    got = mdf.b.expanding().agg(["sum", "count"]).to_pandas()
    ref = pdf.b.expanding().agg(["sum", "count"])
    assert list(got.columns) == ["sum", "count"]
    np.testing.assert_allclose(got["sum"].to_numpy(), ref["sum"].to_numpy())
    np.testing.assert_allclose(got["count"].to_numpy(), ref["count"].to_numpy())


@pytest.mark.parametrize("method", ["average", "min", "max", "first"])
def test_rank(mdf, pdf, method):
    assert_series_equal(mdf.a.rank(method=method), pdf.a.rank(method=method))


def test_rank_desc_pct(mdf, pdf):
    assert_series_equal(mdf.a.rank(method="min", ascending=False), pdf.a.rank(method="min", ascending=False))
    assert_series_equal(mdf.a.rank(method="min", pct=True), pdf.a.rank(method="min", pct=True))


def test_rank_nan(mdf, pdf):
    assert_series_equal(mdf.c.rank(method="average"), pdf.c.rank(method="average"))


def test_ffill_bfill(mdf, pdf):
    assert_series_equal(mdf.c.ffill(), pdf.c.ffill())
    assert_series_equal(mdf.c.bfill(), pdf.c.bfill())


def test_groupby_rolling(mdf, pdf):
    # round 10: pandas-exact shape — (key, original label) MultiIndex in
    # group-major order, Series out for the series-groupby form
    got = mdf.groupby("k")["b"].rolling(3).mean().to_pandas()
    ref = pdf.groupby("k")["b"].rolling(3).mean()
    assert got.index.tolist() == ref.index.tolist()
    np.testing.assert_allclose(got.values, ref.values, rtol=1e-9, equal_nan=True)


def test_block_boundary_correctness(spark):
    """Rolling/cumsum across block boundaries (the halo/carry logic)."""
    import modin_spark.pandas as mpd
    from modin_spark.core import windows

    old = windows.BLOCK
    windows.BLOCK = 16  # force many blocks
    try:
        p = pd.DataFrame({"v": np.arange(100, dtype="float64")})
        m = mpd.from_pandas(p)
        assert_series_equal(m.v.cumsum(), p.v.cumsum())
        assert_series_equal(m.v.rolling(7).sum(), p.v.rolling(7).sum())
        assert_series_equal(m.v.expanding().mean(), p.v.expanding().mean())
        assert_series_equal(m.v.ffill(), p.v.ffill())
    finally:
        windows.BLOCK = old


def test_resample_ffill_asfreq(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:05", "2024-01-01 00:10", "2024-01-01 02:30", "2024-01-01 03:10"]
            ),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    m = mpd.from_pandas(p)
    got = m.resample("1h", on="ts").ffill().reset_index().to_pandas().sort_values("ts").reset_index(drop=True)
    ref = p.set_index("ts").resample("1h").ffill().reset_index()
    np.testing.assert_allclose(got["v"].values, ref["v"].values, equal_nan=True)
    af = m.resample("1h", on="ts").asfreq().reset_index().to_pandas().sort_values("ts").reset_index(drop=True)
    refa = p.set_index("ts").resample("1h").asfreq().reset_index()
    np.testing.assert_allclose(af["v"].values, refa["v"].values, equal_nan=True)


def test_rolling_quantile_apply(mdf, pdf):
    gq = mdf["b"].rolling(5).quantile(0.25).to_pandas()
    rq = pdf["b"].rolling(5).quantile(0.25)
    np.testing.assert_allclose(gq.values, rq.values, rtol=1e-9, equal_nan=True)
    ga = mdf["b"].rolling(4).apply(np.median).to_pandas()
    ra = pdf["b"].rolling(4).apply(np.median)
    np.testing.assert_allclose(ga.values, ra.values, rtol=1e-9, equal_nan=True)


def test_concat_axis1(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"y": [9.0, 8.0, 7.0], "z": ["u", "v", "w"]})
    got = mpd.concat([mpd.from_pandas(a), mpd.from_pandas(b)], axis=1).to_pandas()
    ref = pd.concat([a, b], axis=1)
    assert list(got.columns) == list(ref.columns)
    np.testing.assert_allclose(got["x"].values, ref["x"].values)
    assert got["z"].tolist() == ref["z"].tolist()


def test_concat_axis1_on_index(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"k": [1, 2, 3], "x": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"k": [2, 3, 4], "y": [9.0, 8.0, 7.0]})
    got = (
        mpd.concat([mpd.from_pandas(a).set_index("k"), mpd.from_pandas(b).set_index("k")], axis=1)
        .reset_index().to_pandas().sort_values("k").reset_index(drop=True)
    )
    ref = pd.concat([a.set_index("k"), b.set_index("k")], axis=1).reset_index()
    assert list(got.columns) == list(ref.columns)
    np.testing.assert_allclose(got["x"].values, ref["x"].values, equal_nan=True)
    np.testing.assert_allclose(got["y"].values, ref["y"].values, equal_nan=True)


def test_shift_fill_value_preserves_nans(mdf, pdf):
    # fill_value fills only the vacated head positions; NaNs already in the
    # column stay NaN after shifting into range
    got = mdf.c.shift(2, fill_value=-1.0).to_pandas()
    ref = pdf.c.shift(2, fill_value=-1.0)
    np.testing.assert_allclose(got.values, ref.values, equal_nan=True)


@pytest.mark.parametrize("agg", ["sem", "skew", "kurt"])
def test_expanding_algebraic_tail(mdf, pdf, agg):
    got = getattr(mdf.b.expanding(min_periods=1), agg)()
    ref = getattr(pdf.b.expanding(min_periods=1), agg)()
    assert_series_equal(got, ref)


@pytest.mark.parametrize("agg", ["median", "rank"])
def test_expanding_order_tail(mdf, pdf, agg):
    got = getattr(mdf.b.expanding(min_periods=1), agg)()
    ref = getattr(pdf.b.expanding(min_periods=1), agg)()
    assert_series_equal(got, ref)


def test_expanding_quantile_apply(mdf, pdf):
    got = mdf.b.expanding(min_periods=2).quantile(0.9)
    ref = pdf.b.expanding(min_periods=2).quantile(0.9)
    assert_series_equal(got, ref)
    got = mdf.b.expanding(min_periods=2).apply(np.nanmean)
    ref = pdf.b.expanding(min_periods=2).apply(np.nanmean, raw=True)
    assert_series_equal(got, ref)


@pytest.mark.parametrize("stat", ["corr", "cov"])
def test_expanding_pair(mdf, pdf, stat):
    got = getattr(mdf.b.expanding(min_periods=2), stat)(mdf.a)
    ref = getattr(pdf.b.expanding(min_periods=2), stat)(pdf.a.astype("float64"))
    assert_series_equal(got, ref)


@pytest.mark.parametrize("stat", ["corr", "cov"])
def test_rolling_pair(mdf, pdf, stat):
    got = getattr(mdf.b.rolling(7), stat)(mdf.a)
    ref = getattr(pdf.b.rolling(7), stat)(pdf.a.astype("float64"))
    assert_series_equal(got, ref)


def test_rolling_rank(mdf, pdf):
    got = mdf.b.rolling(5).rank()
    ref = pdf.b.rolling(5).rank()
    assert_series_equal(got, ref)


@pytest.mark.parametrize("agg", ["sem", "skew", "kurt", "median"])
def test_rolling_stat_tail(mdf, pdf, agg):
    got = getattr(mdf.b.rolling(6, min_periods=4), agg)()
    ref = getattr(pdf.b.rolling(6, min_periods=4), agg)()
    assert_series_equal(got, ref)


def test_rank_multicolumn_frame(mdf, pdf):
    # whole-frame rank: all numeric columns batched through one sort per dtype
    got = mdf[["a", "b", "c"]].rank().to_pandas()
    ref = pdf[["a", "b", "c"]].rank()
    for c in ["a", "b", "c"]:
        np.testing.assert_allclose(got[c].values, ref[c].values, equal_nan=True)


def test_rank_multicolumn_pct(mdf, pdf):
    got = mdf[["a", "b"]].rank(method="max", pct=True).to_pandas()
    ref = pdf[["a", "b"]].rank(method="max", pct=True)
    for c in ["a", "b"]:
        np.testing.assert_allclose(got[c].values, ref[c].values, equal_nan=True)


@pytest.mark.parametrize("wt,kw", [("triang", {}), ("hamming", {}), ("gaussian", {"std": 2.0})])
def test_rolling_win_type(mdf, pdf, wt, kw):
    from modin_spark.core.windows import window_weights

    w = 5
    weights = window_weights(wt, w, **kw)
    got = mdf.b.rolling(w, win_type=wt, **kw).mean().to_pandas()
    x = pdf.b.to_numpy()
    ref = np.full(len(x), np.nan)
    for t in range(w - 1, len(x)):
        ref[t] = np.dot(weights, x[t - w + 1:t + 1]) / weights.sum()
    np.testing.assert_allclose(got.values, ref, equal_nan=True, rtol=1e-9)
    got_s = mdf.b.rolling(w, win_type=wt, **kw).sum().to_pandas()
    refs = ref * weights.sum()
    np.testing.assert_allclose(got_s.values, refs, equal_nan=True, rtol=1e-9)


@pytest.mark.parametrize("method", ["mean", "std", "var"])
def test_ewm(mdf, pdf, method):
    got = getattr(mdf.b.ewm(span=5), method)()
    ref = getattr(pdf.b.ewm(span=5), method)()
    assert_series_equal(got, ref)


def test_ewm_alpha_nan(mdf, pdf):
    got = mdf.c.ewm(alpha=0.3, min_periods=2).mean()
    ref = pdf.c.ewm(alpha=0.3, min_periods=2).mean()
    assert_series_equal(got, ref)


def test_ewm_block_boundary(spark):
    """EWM across block boundaries: the decay-halo must carry enough history."""
    import modin_spark.pandas as mpd
    from modin_spark.core import windows

    old = windows.BLOCK
    windows.BLOCK = 64
    try:
        p = pd.DataFrame({"v": np.sin(np.arange(500) * 0.37) * 10})
        m = mpd.from_pandas(p)
        got = m.v.ewm(span=9).mean().to_pandas()
        ref = p.v.ewm(span=9).mean()
        np.testing.assert_allclose(got.values, ref.values, rtol=1e-9)
    finally:
        windows.BLOCK = old


def test_rolling_center(spark):
    """center=True == trailing window shifted by (w-1)//2 — one extra shift
    on the block+halo machinery, no new window shape."""
    import numpy as np

    import modin_spark.pandas as mpd

    ev = mpd.read_parquet("/root/testdata/sf0.001/events.parquet")
    pv = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    for w in [3, 4, 7]:
        a = ev["value"].rolling(w, center=True).mean().to_pandas()
        b = pv["value"].rolling(w, center=True).mean()
        assert np.allclose(a.fillna(-1).values, b.fillna(-1).values, rtol=1e-9)
    af = ev[["value", "user_id"]].rolling(5, center=True).sum().to_pandas()
    bf = pv[["value", "user_id"]].rolling(5, center=True).sum()
    assert np.allclose(af.fillna(-1).values, bf.fillna(-1).values, rtol=1e-9)


def test_rolling_time_offset_windows(spark):
    """rolling("10min") on a DatetimeIndex — bucketized self-join plan,
    values match pandas exactly, row-aligned."""
    import numpy as np

    import modin_spark.pandas as mpd

    ev = mpd.read_parquet("/root/testdata/sf0.001/events.parquet").sort_values("ts").set_index("ts")
    pv = pd.read_parquet("/root/testdata/sf0.001/events.parquet").sort_values("ts").set_index("ts")
    for agg in ["sum", "mean", "count", "max", "std"]:
        a = getattr(ev["value"].rolling("10min"), agg)().to_pandas()
        b = getattr(pv["value"].rolling("10min"), agg)()
        assert np.allclose(a.fillna(-9).values, b.fillna(-9).values, rtol=1e-9), agg


def test_rolling_time_no_single_partition(spark):
    from modin_spark import plans

    import modin_spark.pandas as mpd

    ev = mpd.read_parquet("/root/testdata/sf0.001/events.parquet").sort_values("ts").set_index("ts")
    out = ev["value"].rolling("10min").sum()
    fr = out._to_frame("__v__")
    assert plans.unsafe_single_partition_exchanges(fr.sdf) == 0, plans.physical_plan(fr.sdf)
