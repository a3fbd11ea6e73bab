"""GroupBy: aggregations (vs pandas), transforms, apply."""

import numpy as np
import pandas as pd
import pytest

from tests.conftest import assert_df_equal, assert_series_equal

AGGS = ["sum", "mean", "min", "max", "count", "std", "var", "median", "nunique"]


@pytest.mark.parametrize("agg", AGGS)
def test_groupby_agg(mdf, pdf, agg):
    got = getattr(mdf.groupby("k")[["a", "b"]], agg)().to_pandas()
    ref = getattr(pdf.groupby("k")[["a", "b"]], agg)()
    np.testing.assert_allclose(got.values.astype(float), ref.values.astype(float), rtol=1e-9)
    assert list(got.index) == list(ref.index)


def test_groupby_size(mdf, pdf):
    got = mdf.groupby("k").size().to_pandas()
    ref = pdf.groupby("k").size()
    assert (got.values == ref.values).all()


def test_groupby_agg_dict(mdf, pdf):
    got = mdf.groupby("k").agg({"a": "sum", "b": "mean"}).to_pandas()
    ref = pdf.groupby("k").agg({"a": "sum", "b": "mean"})
    np.testing.assert_allclose(got.values, ref.values, rtol=1e-9)


def test_groupby_named_agg(mdf, pdf):
    got = mdf.groupby("k").agg(total=("a", "sum"), avg_b=("b", "mean")).to_pandas()
    ref = pdf.groupby("k").agg(total=("a", "sum"), avg_b=("b", "mean"))
    np.testing.assert_allclose(got.values, ref.values, rtol=1e-9)
    assert list(got.columns) == list(ref.columns)


def test_groupby_multi_key(mdf, pdf):
    mdf2 = mdf.assign(k2=mdf.a % 3)
    pdf2 = pdf.assign(k2=pdf.a % 3)
    got = mdf2.groupby(["k", "k2"]).agg(s=("b", "sum")).reset_index().to_pandas()
    ref = pdf2.groupby(["k", "k2"]).agg(s=("b", "sum")).reset_index()
    assert_df_equal(got, ref, sort_by=["k", "k2"])


def test_groupby_first_last(mdf, pdf):
    got = mdf.groupby("k")[["a"]].first().to_pandas()
    ref = pdf.groupby("k")[["a"]].first()
    assert (got["a"].values == ref["a"].values).all()
    got = mdf.groupby("k")[["a"]].last().to_pandas()
    ref = pdf.groupby("k")[["a"]].last()
    assert (got["a"].values == ref["a"].values).all()


def test_groupby_skew(mdf, pdf):
    got = mdf.groupby("k")[["b"]].skew().to_pandas()
    ref = pdf.groupby("k")[["b"]].skew()
    np.testing.assert_allclose(got.values, ref.values, rtol=1e-8)


def test_groupby_cumsum(mdf, pdf):
    got = mdf.groupby("k")[["a"]].cumsum().to_pandas()
    ref = pdf.groupby("k")[["a"]].cumsum()
    assert (got["a"].values == ref["a"].values).all()


def test_groupby_shift_diff(mdf, pdf):
    got = mdf.groupby("k")[["a"]].shift(1).to_pandas()
    ref = pdf.groupby("k")[["a"]].shift(1)
    assert_series_equal(got["a"].astype("float64"), ref["a"].astype("float64"))
    got = mdf.groupby("k")[["a"]].diff(1).to_pandas()
    ref = pdf.groupby("k")[["a"]].diff(1)
    assert_series_equal(got["a"], ref["a"].astype("float64"))


def test_groupby_cumcount(mdf, pdf):
    got = mdf.groupby("k").cumcount().to_pandas()
    ref = pdf.groupby("k").cumcount()
    assert (got.values == ref.values).all()


def test_groupby_rank(mdf, pdf):
    got = mdf.groupby("k")[["b"]].rank("min").to_pandas()
    ref = pdf.groupby("k")[["b"]].rank("min")
    np.testing.assert_allclose(got["b"].values, ref["b"].values)


def test_groupby_head_nth(mdf, pdf):
    got = mdf.groupby("k").head(2).to_pandas()
    ref = pdf.groupby("k").head(2)
    assert_df_equal(got, ref.reset_index(drop=True))


def test_groupby_apply(mdf, pdf):
    def top2(g):
        return g.nlargest(2, "b")[["a", "b"]]

    got = mdf.groupby("k").apply(top2).reset_index().to_pandas()
    ref = pdf.groupby("k").apply(top2, include_groups=False).reset_index(level=0).reset_index(drop=True)
    assert_df_equal(got[["k", "a", "b"]], ref[["k", "a", "b"]], sort_by=["k", "b"])


def test_groupby_by_series(mdf, pdf):
    got = mdf.groupby(mdf.a % 5).agg(s=("b", "sum")).reset_index().to_pandas()
    ref = pdf.groupby(pdf.a % 5).agg(s=("b", "sum")).reset_index().rename(columns={"a": "a"})
    np.testing.assert_allclose(
        got.sort_values("a")["s"].values, ref.sort_values("a")["s"].values, rtol=1e-9
    )


def test_groupby_ohlc(mdf, pdf):
    got = mdf.groupby("k")[["b"]].ohlc().to_pandas()
    ref = pdf.groupby("k")[["b"]].ohlc()["b"]
    np.testing.assert_allclose(got.values, ref.values, rtol=1e-9)


def test_value_counts(mdf, pdf):
    got = mdf.k.value_counts().to_pandas()
    ref = pdf.k.value_counts()
    assert (got.values == ref.values).all()


def test_pivot_table(mdf, pdf):
    mdf2 = mdf.assign(k2=mdf.a % 2)
    pdf2 = pdf.assign(k2=pdf.a % 2)
    got = mdf2.pivot_table(values="b", index=["k"], columns="k2", aggfunc="mean").to_pandas()
    ref = pdf2.pivot_table(values="b", index=["k"], columns="k2", aggfunc="mean")
    np.testing.assert_allclose(got.values, ref.values, rtol=1e-9)


def test_resample(spark):
    import modin_spark.pandas as mpd

    p = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=100, freq="13min"),
            "v": np.arange(100, dtype="float64"),
        }
    )
    m = mpd.from_pandas(p)
    got = m.resample("1h", on="ts").sum().to_pandas().sort_index()
    ref = p.resample("1h", on="ts").sum()
    np.testing.assert_allclose(got["v"].values, ref["v"].values)


def test_groupby_transform_str(mdf, pdf):
    for fn in ["sum", "mean", "max", "size", "nunique"]:
        got = mdf.groupby("k")[["a", "b"]].transform(fn).to_pandas()
        ref = pdf.groupby("k")[["a", "b"]].transform(fn)
        if isinstance(ref, pd.Series):  # pandas returns a Series for "size"
            ref = pd.DataFrame({"a": ref, "b": ref})
        np.testing.assert_allclose(got.values.astype(float), ref.values.astype(float), rtol=1e-9)


def test_groupby_transform_callable(mdf, pdf):
    got = mdf.groupby("k")[["a", "b"]].transform(lambda g: g - g.mean()).to_pandas()
    ref = pdf.groupby("k")[["a", "b"]].transform(lambda g: g - g.mean())
    np.testing.assert_allclose(got.values.astype(float), ref.values.astype(float), rtol=1e-9)


def test_groupby_filter(mdf, pdf):
    got = mdf.groupby("k").filter(lambda g: g["a"].mean() > 45).to_pandas()
    ref = pdf.groupby("k").filter(lambda g: g["a"].mean() > 45)
    assert_df_equal(got, ref.reset_index(drop=True))


def test_groupby_get_group(mdf, pdf):
    got = mdf.groupby("k").get_group("x").to_pandas()
    ref = pdf.groupby("k").get_group("x")
    assert_df_equal(got, ref.reset_index(drop=True))


def test_groupby_idxmax_idxmin(mdf, pdf):
    got = mdf.groupby("k")[["a", "b"]].idxmax().to_pandas().sort_index()
    ref = pdf.groupby("k")[["a", "b"]].idxmax().sort_index()
    # when ties exist pandas picks first occurrence; our max_by ties are
    # arbitrary -> compare the *values at* the returned positions for 'a'
    for k in ref.index:
        assert pdf["a"].iloc[int(got.loc[k, "a"])] == pdf["a"].iloc[int(ref.loc[k, "a"])]
    np.testing.assert_array_equal(got["b"].values, ref["b"].values)
    gotn = mdf.groupby("k")[["b"]].idxmin().to_pandas().sort_index()
    refn = pdf.groupby("k")[["b"]].idxmin().sort_index()
    np.testing.assert_array_equal(gotn["b"].values, refn["b"].values)


def test_groupby_cumprod_pct_change(mdf, pdf):
    small = pdf.assign(b=pdf.b / 50)
    import modin_spark.pandas as mpd

    msmall = mpd.from_pandas(small)
    got = msmall.groupby("k")[["b"]].cumprod().to_pandas()
    ref = small.groupby("k")[["b"]].cumprod()
    np.testing.assert_allclose(got["b"].values, ref["b"].values, rtol=1e-6)
    got = msmall.groupby("k")[["b"]].pct_change().to_pandas()
    ref = small.groupby("k")[["b"]].pct_change()
    np.testing.assert_allclose(got["b"].values, ref["b"].values, rtol=1e-9, equal_nan=True)


def test_groupby_tail(mdf, pdf):
    got = mdf.groupby("k").tail(3).to_pandas()
    ref = pdf.groupby("k").tail(3)
    assert_df_equal(got, ref.reset_index(drop=True))


def test_groupby_rank_average(mdf, pdf):
    # ties must get the average rank (pandas default), not the min
    got = mdf.groupby("k")[["a"]].rank("average").to_pandas()
    ref = pdf.groupby("k")[["a"]].rank("average")
    np.testing.assert_allclose(got["a"].values, ref["a"].values)


@pytest.fixture()
def rs(spark):
    import modin_spark.pandas as mpd

    rng = np.random.default_rng(13)
    p = pd.DataFrame(
        {
            # irregular spacing with gaps so asfreq/interpolate/nearest matter
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(np.sort(rng.choice(3000, 80, replace=False)), "min"),
            "v": rng.random(80) * 50,
        }
    )
    return mpd.from_pandas(p), p


def test_resample_agg_dict_apply(rs):
    m, p = rs
    got = m.resample("2h", on="ts").agg({"v": "mean"}).to_pandas().sort_index()
    ref = p.resample("2h", on="ts").agg({"v": "mean"}).dropna()
    np.testing.assert_allclose(got["v"].values, ref["v"].values)
    got2 = m.resample("2h", on="ts").apply({"v": "max"}).to_pandas().sort_index()
    ref2 = p.resample("2h", on="ts").apply({"v": "max"}).dropna()
    np.testing.assert_allclose(got2["v"].values, ref2["v"].values)


def test_resample_transform(rs):
    m, p = rs
    got = m.set_index("ts").resample("2h").transform("mean").to_pandas()
    ref = p.set_index("ts").resample("2h").transform("mean")
    np.testing.assert_allclose(np.sort(got["v"].values), np.sort(ref["v"].values))


def test_resample_interpolate(rs):
    m, p = rs
    got = m.resample("1h", on="ts").interpolate().to_pandas().sort_index()
    ref = p.set_index("ts").resample("1h").asfreq().interpolate(method="linear")
    np.testing.assert_allclose(got["v"].values, ref["v"].values, equal_nan=True)


def test_resample_nearest(rs):
    m, p = rs
    got = m.resample("1h", on="ts").nearest().to_pandas().sort_index()
    ref = p.set_index("ts").resample("1h").nearest()
    np.testing.assert_allclose(got["v"].values, ref["v"].values, equal_nan=True)


def test_resample_pipe_get_group(rs):
    m, p = rs
    n = m.resample("2h", on="ts").pipe(lambda r: r.count()).to_pandas()
    assert n["v"].sum() == 80
    first_bucket = p.set_index("ts").resample("2h").count().index[0]
    g = m.resample("2h", on="ts").get_group(first_bucket).to_pandas()
    ref_g = p[(p.ts >= first_bucket) & (p.ts < first_bucket + pd.Timedelta("2h"))]
    assert len(g) == len(ref_g)


def test_groupby_nlargest_nsmallest(mdf, pdf):
    got = mdf.groupby("k")["b"].nlargest(3).to_pandas()
    ref = pdf.groupby("k")["b"].nlargest(3)
    np.testing.assert_allclose(np.sort(got.values), np.sort(ref.values))
    got2 = mdf.groupby("k")["b"].nsmallest(2).to_pandas()
    ref2 = pdf.groupby("k")["b"].nsmallest(2)
    np.testing.assert_allclose(np.sort(got2.values), np.sort(ref2.values))


def test_groupby_unique(mdf, pdf):
    got = mdf.groupby("k")["a"].unique().to_pandas()
    ref = pdf.groupby("k")["a"].unique()
    for k in ref.index:
        assert list(got.loc[k]) == list(ref.loc[k]), k


def test_series_groupby_unaligned_key(spark):
    import modin_spark.pandas as mpd

    s = mpd.from_pandas(pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]}))["v"]
    key = mpd.from_pandas(pd.DataFrame({"k": ["a", "b", "a", "b"]}))["k"]
    got = s.groupby(key).sum().to_pandas().sort_index()
    ref = pd.Series([1.0, 2.0, 3.0, 4.0], name="v").groupby(
        pd.Series(["a", "b", "a", "b"])).sum().sort_index()
    np.testing.assert_allclose(got.values, ref.values)


def test_approx_aggregates(spark):
    """Net-new approx variants (SURVEY §2.4): sketch-based, within tolerance
    of the exact values — the 100 TB path for nunique/median."""
    import modin_spark.pandas as mpd

    li = mpd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    g = (
        li.groupby(["l_returnflag"])
        .agg(ap=("l_partkey", "approx_nunique"), ex=("l_partkey", "nunique"),
             am=("l_quantity", "approx_median"), em=("l_quantity", "median"))
        .reset_index()
        .to_pandas()
    )
    assert ((g.ap - g.ex).abs() / g.ex <= 0.05).all(), g
    assert ((g.am - g.em).abs() <= 1.0).all(), g


def test_groupby_api_tail(spark):
    """Round-3 groupby tail: ngroups/describe/value_counts/sample/take/
    expanding/fillna — differential vs pandas."""
    import numpy as np

    import modin_spark.pandas as mpd

    m = mpd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    g, gp = m.groupby(["l_returnflag"]), p.groupby(["l_returnflag"])
    assert g.ngroups == gp.ngroups
    d = g[["l_quantity"]].describe().reset_index().to_pandas()
    dp = gp[["l_quantity"]].describe().reset_index()
    assert d.shape == dp.shape
    assert np.allclose(sorted(d[("l_quantity", "mean")]), sorted(dp[("l_quantity", "mean")]))
    assert np.allclose(sorted(d[("l_quantity", "50%")]), sorted(dp[("l_quantity", "50%")]))
    vc = g[["l_linestatus"]].value_counts().to_pandas()
    vcp = gp["l_linestatus"].value_counts()
    assert sorted(vc.tolist()) == sorted(vcp.tolist())
    assert len(g.take([0, 1])) == len(gp.take([0, 1]))
    assert 0 < len(g.sample(frac=0.3, random_state=1)) < len(p)
    ge = g[["l_quantity"]].expanding().sum().to_pandas()["l_quantity"]
    pe = gp["l_quantity"].expanding().sum().reset_index(drop=True)
    assert abs(ge.sum() - pe.sum()) / abs(pe.sum()) < 1e-9


def test_groupby_resample(spark):
    """Grouped time resample: one hash aggregate on (keys, window-start).
    Only observed buckets are emitted (sparse; pandas emits the full
    timeline) — sums agree."""
    import modin_spark.pandas as mpd

    ev = mpd.read_parquet("/root/testdata/sf0.001/events.parquet").set_index("ts")
    pev = pd.read_parquet("/root/testdata/sf0.001/events.parquet").set_index("ts")
    out = ev.groupby(["event_type"]).resample("1h")[["value"]].sum().reset_index().to_pandas()
    outp = pev.groupby(["event_type"]).resample("1h")["value"].sum().reset_index()
    assert abs(out["value"].sum() - outp["value"].sum()) < 1e-6
    nonzero = outp[outp["value"].notna() & (outp["value"] != 0)]
    assert len(out) >= len(nonzero) * 0.9


def test_groupby_grouper_freq(spark):
    """pd.Grouper(key, freq) groups on resample-style time buckets; plain
    Grouper(key) degrades to the key; both match pandas."""
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=12, freq="25min"),
        "k": ["a", "b"] * 6,
        "v": list(range(12)),
    })
    d = mpd.from_pandas(pdf)
    got = d.groupby(mpd.Grouper(key="ts", freq="1h")).agg(total=("v", "sum")).to_pandas()
    want = pdf.groupby(pd.Grouper(key="ts", freq="1h")).agg(total=("v", "sum"))
    assert got["total"].tolist() == want["total"].tolist()
    assert list(got.index) == list(want.index)

    got2 = d.groupby([mpd.Grouper(key="ts", freq="1h"), "k"]).agg(total=("v", "sum")).to_pandas().sort_index()
    want2 = pdf.groupby([pd.Grouper(key="ts", freq="1h"), "k"]).agg(total=("v", "sum")).sort_index()
    assert got2["total"].tolist() == want2["total"].tolist()

    got3 = d.groupby(mpd.Grouper(key="k")).agg(total=("v", "sum")).to_pandas()
    assert got3["total"].tolist() == pdf.groupby("k").agg(total=("v", "sum"))["total"].tolist()


def test_groupby_namedagg_kwarg(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    got = mpd.from_pandas(pdf).groupby("k").agg(total=mpd.NamedAgg("v", "sum")).to_pandas()
    want = pdf.groupby("k").agg(total=pd.NamedAgg("v", "sum"))
    assert got["total"].tolist() == want["total"].tolist()
