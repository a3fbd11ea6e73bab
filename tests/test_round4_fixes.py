"""Round-4 advisor fixes, differential vs pandas.

Covers: centered rolling windows with min_periods < window (all agg paths),
centered weighted windows, str.extractall (doc, match) MultiIndex, pandas
div-by-zero semantics on Series division (forward + reversed), groupby.take
with negative positions, and exact integer time-bucketing for offset rolling
windows at extreme epochs.
"""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def S(ps: pd.Series):
    return mpd.from_pandas(ps.to_frame("v")).v


def eq_series(mine, ref):
    pd.testing.assert_series_equal(mine.to_pandas(), ref, check_dtype=False, check_names=False)


def eq_frame(mine, ref):
    pd.testing.assert_frame_equal(mine.to_pandas(), ref, check_dtype=False, check_names=False)


_S = pd.Series([1.0, 2, 3, 4, 5, 6, 7])


@pytest.mark.parametrize(
    "w,mp,agg",
    [(3, 1, "sum"), (3, None, "sum"), (4, 2, "mean"), (5, 3, "max"), (4, 2, "std")],
)
def test_rolling_center_aggs(spark, w, mp, agg):
    got = getattr(S(_S).rolling(w, center=True, min_periods=mp), agg)()
    ref = getattr(_S.rolling(w, center=True, min_periods=mp), agg)()
    eq_series(got, ref)


def test_rolling_center_quantile_rank_apply(spark):
    eq_series(
        S(_S).rolling(3, center=True, min_periods=1).quantile(0.5),
        _S.rolling(3, center=True, min_periods=1).quantile(0.5),
    )
    eq_series(
        S(_S).rolling(3, center=True, min_periods=1).rank(),
        _S.rolling(3, center=True, min_periods=1).rank(),
    )
    eq_series(
        S(_S).rolling(3, center=True, min_periods=1).apply(np.nansum),
        _S.rolling(3, center=True, min_periods=1).apply(np.nansum),
    )


def test_rolling_center_corr(spark):
    s2 = pd.Series([2.0, 1, 4, 3, 6, 5, 8])
    eq_series(
        S(_S).rolling(4, center=True, min_periods=2).corr(S(s2)),
        _S.rolling(4, center=True, min_periods=2).corr(s2),
    )


def test_rolling_center_weighted_manual(spark):
    # pandas needs scipy for win_type (absent here): expected computed from
    # the closed-form triang weights [0.5, 1, 0.5]
    w = np.array([0.5, 1.0, 0.5])
    x = _S.to_numpy()
    exp = pd.Series([np.nan] + [w @ x[i - 1 : i + 2] for i in range(1, 6)] + [np.nan])
    eq_series(S(_S).rolling(3, win_type="triang", center=True).sum(), exp)


def test_rolling_center_offset_window_raises(spark):
    with pytest.raises(NotImplementedError):
        S(_S).rolling("10min", center=True).sum()


def test_rolling_agg_list(spark):
    eq_frame(S(_S).rolling(3).agg(["sum", "mean"]), _S.rolling(3).agg(["sum", "mean"]))


def test_extractall_multiindex(spark):
    ps = pd.Series(["a1b2", "c3", "no", "d4e5f6"])
    eq_frame(S(ps).str.extractall(r"([a-z])(\d)"), ps.str.extractall(r"([a-z])(\d)"))


def test_extractall_custom_index(spark):
    ps = pd.Series(["x1", "y2z3"], index=pd.Index(["p", "q"]))
    eq_frame(S(ps).str.extractall(r"(\d)"), ps.str.extractall(r"(\d)"))


def test_series_div_by_zero_semantics(spark):
    a = pd.Series([1.0, -2.0, 0.0, 5.0])
    b = pd.Series([0.0, 0.0, 0.0, 2.0])
    ma, mb = S(a), S(b)
    eq_series(ma / mb, a / b)
    eq_series(ma // mb, a // b)
    eq_series(ma.rtruediv(mb), a.rtruediv(b))
    eq_series(ma.rfloordiv(mb), a.rfloordiv(b))
    eq_series(ma.rdiv(2), a.rdiv(2))
    eq_series(S(pd.Series([1.0, 2.0])).rdiv(0), pd.Series([1.0, 2.0]).rdiv(0))


def test_groupby_take_negative(spark):
    pdf = pd.DataFrame({"k": ["a", "a", "a", "b", "b", "c"], "v": [1, 2, 3, 4, 5, 6]})
    mdf = mpd.from_pandas(pdf)
    got = sorted(mdf.groupby("k").take([-1]).to_pandas()["v"].tolist())
    exp = sorted(pdf.groupby("k").take([-1])["v"].tolist())
    assert got == exp
    got = sorted(mdf.groupby("k").take([0, -1]).to_pandas()["v"].tolist())
    assert got == [1, 3, 4, 5, 6]  # set semantics: 1-row group 'c' appears once


def test_rolling_time_bucket_extreme_epoch(spark):
    # epochs straddling 2^53 µs (~year 2255): double division would round the
    # bucket quotient; exact integer bucketing must keep every contributor
    base = (1 << 53) - 2
    ts = pd.to_datetime([base + i * 60_000_000 for i in range(40)], unit="us")
    ps = pd.Series(np.arange(40, dtype="float64"), index=ts)
    got = S(ps).rolling("5min").sum()
    ref = ps.rolling("5min").sum()
    np.testing.assert_allclose(got.to_pandas().to_numpy(), ref.to_numpy())


# ---------------------------------------------------------------------------
# distributed apply(axis=0) and transpose
# ---------------------------------------------------------------------------

def test_apply_axis0_distributed_plan(spark):
    """A 10-col frame must run column UDFs via applyInPandas (FlatMapGroupsInPandas
    in the plan) with NO driver-side pandas fallback warning."""
    import warnings

    import modin_spark.pandas as mpd
    from modin_spark import plans

    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({f"c{i}": rng.random(500) for i in range(10)})
    mdf = mpd.from_pandas(pdf)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # driver fallback warns -> fail
        z = mdf.apply(lambda s: (s - s.mean()) / s.std())
        plan = plans.physical_plan(z._frame.sdf)
    assert "FlatMapGroupsInPandas" in plan, plan
    pd.testing.assert_frame_equal(
        z.to_pandas(), pdf.apply(lambda s: (s - s.mean()) / s.std()), check_dtype=False
    )


def test_apply_axis0_reduction(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [1.0, 2, 3, 4], "b": [10.0, 20, 30, 40]})
    got = mpd.from_pandas(pdf).apply(lambda s: s.max() - s.min())
    pd.testing.assert_series_equal(got, pdf.apply(lambda s: s.max() - s.min()), check_dtype=False)


def test_apply_axis0_nonnumeric_falls_back(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [1, 2], "s": ["u", "v"]})
    got = mpd.from_pandas(pdf).apply(lambda s: s.astype(str).str.len() if s.dtype == object else s)
    assert len(got.to_pandas()) == 2


def test_transpose_distributed(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [1.0, 2, 3, 4], "b": [10.0, 20, 30, 40], "c": [5, 6, 7, 8]})
    got = mpd.from_pandas(pdf).T.to_pandas()
    # r9: transposed column labels keep their native int type, pandas-exact
    exp = pdf.T
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_names=False,
                                  check_index_type=False)


def test_transpose_distributed_labeled(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame(
        {"x": [1.0, 2, 3], "y": [4.0, 5, 6]}, index=pd.Index(["p", "q", "r"])
    )
    got = mpd.from_pandas(pdf).T.to_pandas()
    pd.testing.assert_frame_equal(got, pdf.T, check_dtype=False, check_names=False)


def test_transpose_mixed_dtype_driver_path(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [1, 2], "s": ["u", "v"]})
    got = mpd.from_pandas(pdf).T.to_pandas()
    assert list(got.index) == ["a", "s"]


def test_rolling_weighted_var_std_manual(spark):
    """pandas roll_weighted_var formula: var = Σw(x-μ)²·n/((n-1)·Σw),
    μ = Σwx/Σw (pandas needs scipy for win_type, absent here — expected
    computed directly from the closed-form triang weights)."""
    w = np.array([0.25, 0.75, 0.75, 0.25])
    sw = w.sum()
    x = _S.to_numpy()
    exp_var = [np.nan] * 3
    for i in range(3, len(x)):
        win = x[i - 3 : i + 1]
        mu = (w * win).sum() / sw
        t = (w * (win - mu) ** 2).sum()
        exp_var.append(t * 4 / (3 * sw))
    eq_series(S(_S).rolling(4, win_type="triang").var(), pd.Series(exp_var))
    eq_series(S(_S).rolling(4, win_type="triang").std(), pd.Series(np.sqrt(exp_var)))


def test_unstack_multi_value_columns(spark):
    pdf = pd.DataFrame(
        {"k": ["a", "a", "b", "b"], "c": ["u", "v", "u", "v"],
         "x": [1.0, 2, 3, 4], "y": [10.0, 20, 30, 40]}
    ).set_index(["k", "c"])
    got = mpd.from_pandas(pdf.reset_index()).set_index(["k", "c"]).unstack().to_pandas()
    exp = pdf.unstack()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_names=False)


def test_groupby_rolling_center(spark):
    pdf = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 4, "v": [1.0, 2, 3, 4, 5, 10, 20, 30, 40]})
    got = mpd.from_pandas(pdf).groupby("k").rolling(3, center=True, min_periods=1).mean().to_pandas()
    exp = pdf.groupby("k").rolling(3, center=True, min_periods=1).mean().reset_index(drop=True)
    np.testing.assert_allclose(got["v"].to_numpy(), exp["v"].to_numpy())


def test_corr_spearman(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"a": rng.random(300), "b": rng.random(300)})
    pdf["c"] = pdf.a * 2 + rng.random(300) * 0.1
    mdf = mpd.from_pandas(pdf)
    got = mdf.corr(method="spearman")
    exp = pdf.corr(method="spearman")
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(), rtol=1e-9)
    # pandas Series.corr(spearman) imports scipy (absent here): reference =
    # rank-then-pearson, the identical definition
    s = mdf.a.corr(mdf.c, method="spearman")
    assert abs(s - pdf.a.rank().corr(pdf.c.rank())) < 1e-9


@pytest.mark.parametrize("closed", ["left", "both", "neither"])
def test_rolling_fixed_window_closed(spark, closed):
    got = S(_S).rolling(3, closed=closed, min_periods=1).sum()
    ref = _S.rolling(3, closed=closed, min_periods=1).sum()
    eq_series(got, ref)
