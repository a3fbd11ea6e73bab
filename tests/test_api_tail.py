"""Differential tests for the long-tail pandas API surface (reference:
modin/pandas/{base,dataframe}.py method inventory) — each op runs on both
modin_spark and pandas over the same parquet and must agree."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def both(spark):
    import modin_spark.pandas as mpd

    return mpd.read_parquet(f"{SF}/nation.parquet"), pd.read_parquet(f"{SF}/nation.parquet")


def test_comparison_methods(both):
    m, p = both
    for meth in ["eq", "ne", "gt", "ge", "lt", "le"]:
        got = getattr(m[["n_nationkey", "n_regionkey"]], meth)(3).to_pandas()
        exp = getattr(p[["n_nationkey", "n_regionkey"]], meth)(3)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))


def test_reversed_arithmetic(both):
    m, p = both
    # head(8) keeps rpow inside int64: pandas wraps on integer overflow
    # (platform artifact), Spark computes in double — not semantics we chase
    for meth in ["radd", "rsub", "rmul", "rtruediv", "rfloordiv", "rmod", "rpow"]:
        got = getattr(m[["n_nationkey"]].head(8), meth)(7).to_pandas()
        exp = getattr(p[["n_nationkey"]].head(8), meth)(7)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
        )


def test_sample_frac_and_n(both):
    m, p = both
    a = m.sample(frac=0.5, random_state=3).to_pandas()
    b = m.sample(frac=0.5, random_state=3).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # deterministic for a fixed seed
    assert 0 < len(a) < len(p)
    assert len(m.sample(n=6, random_state=1)) == 6


def test_filter_items_like_regex(both):
    m, p = both
    for kw in [{"items": ["n_name", "n_regionkey"]}, {"like": "region"}, {"regex": "^n_n"}]:
        assert list(m.filter(**kw).columns) == list(p.filter(**kw).columns)


def test_reindex_columns_and_rows(both):
    m, p = both
    got = m.reindex(columns=["n_name", "nope"]).to_pandas()
    exp = p.reindex(columns=["n_name", "nope"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))
    got = (
        m.set_index("n_nationkey").reindex(index=[2, 0, 99]).to_pandas()["n_name"]
    )
    exp = p.set_index("n_nationkey").reindex(index=[2, 0, 99])["n_name"]
    assert sorted(got.fillna("NA")) == sorted(exp.fillna("NA"))


def test_xs_and_droplevel(both):
    m, p = both
    mi = m.set_index(["n_regionkey", "n_nationkey"])
    pi = p.set_index(["n_regionkey", "n_nationkey"])
    got = mi.xs(2).to_pandas().sort_index()
    exp = pi.xs(2).sort_index()
    pd.testing.assert_frame_equal(got, exp)
    assert m.set_index(["n_regionkey", "n_nationkey"]).droplevel(0).to_pandas().index.name == "n_nationkey"


def test_at_iat(both):
    m, p = both
    assert m.iat[3, 1] == p.iat[3, 1]
    assert m.at[3, "n_name"] == p.at[3, "n_name"]


def test_time_filters(spark):
    import modin_spark.pandas as mpd

    ev = mpd.read_parquet(f"{SF}/events.parquet").sort_values("ts").set_index("ts")
    pev = pd.read_parquet(f"{SF}/events.parquet").sort_values("ts").set_index("ts")
    got = ev.between_time("01:00", "02:00").to_pandas()
    exp = pev.between_time("01:00", "02:00")
    assert len(got) == len(exp)
    got_f = ev.first("2h").to_pandas()
    exp_f = pev.first("2h")
    assert len(got_f) == len(exp_f)
    got_l = ev.last("2h").to_pandas()
    exp_l = pev.last("2h")
    assert len(got_l) == len(exp_l)
    t0, t1 = pev.index[100], pev.index[200]
    assert len(ev.truncate(t0, t1)) == len(pev.truncate(t0, t1))


def test_corrwith_align(both):
    m, p = both
    num_m, num_p = m[["n_nationkey", "n_regionkey"]], p[["n_nationkey", "n_regionkey"]]
    got = num_m.corrwith(num_m * 2).to_pandas()
    exp = num_p.corrwith(num_p * 2)
    np.testing.assert_allclose(got.values, exp.values)
    am, bm = m[["n_name"]].align(m[["n_name", "n_regionkey"]])
    ap, bp = p[["n_name"]].align(p[["n_name", "n_regionkey"]])
    assert list(am.columns) == list(ap.columns) and list(bm.columns) == list(bp.columns)


def test_driver_side_representations(both):
    m, p = both
    h = m.head(3)
    hp = p.head(3)
    assert h.to_dict() == hp.to_dict()
    assert (h.to_numpy() == hp.to_numpy()).all()
    assert h.to_string() == hp.to_string()
    assert m.size == p.size and m.ndim == 2
    assert list(m.keys()) == list(p.keys())


def test_set_axis_and_rename_axis(both):
    m, p = both
    labels = [f"c{i}" for i in range(len(p.columns))]
    got = m.set_axis(labels, axis=1)
    assert list(got.columns) == labels
    r = m.set_index("n_nationkey").rename_axis("key")
    assert r.to_pandas().index.name == "key"


def test_series_tail(both):
    m, p = both
    s, sp = m["n_nationkey"], p["n_nationkey"]
    assert s.argmax() == sp.argmax() and s.argmin() == sp.argmin()
    assert list(s.items())[:3] == list(sp.items())[:3]
    assert (s.ravel() == sp.ravel()).all()
    codes, _ = s.factorize()
    codes_p, _ = sp.factorize()
    assert (codes == codes_p).all()


def test_pop_isetitem(both):
    m, p = both
    mc, pc = m.copy(), p.copy()
    sm = mc.pop("n_name")
    sp2 = pc.pop("n_name")
    assert list(mc.columns) == list(pc.columns)
    assert sorted(sm.to_pandas().fillna("")) == sorted(sp2.fillna(""))


def test_series_loc_iloc(both):
    m, p = both
    s, sp = m["n_regionkey"], p["n_regionkey"]
    assert s.iloc[3] == sp.iloc[3]
    assert s.iloc[1:4].to_pandas().tolist() == sp.iloc[1:4].tolist()
    assert s.loc[2] == sp.loc[2]
    lab, labp = m.set_index("n_nationkey")["n_name"], p.set_index("n_nationkey")["n_name"]
    assert lab.loc[4] == labp.loc[4]
    assert lab.get(999, "dflt") == labp.get(999, "dflt") == "dflt"


def test_series_stats_tail(both):
    m, p = both
    s, sp = m["n_regionkey"], p["n_regionkey"]
    k, kp = m["n_nationkey"], p["n_nationkey"]
    assert abs(s.corr(k) - sp.corr(kp)) < 1e-9
    assert abs(s.cov(k) - sp.cov(kp)) < 1e-9
    assert s.is_monotonic_increasing == sp.is_monotonic_increasing
    assert k.is_monotonic_increasing == kp.is_monotonic_increasing
    assert k.is_monotonic_decreasing == kp.is_monotonic_decreasing
    assert s.is_unique == sp.is_unique and k.is_unique == kp.is_unique
    assert s.hasnans == sp.hasnans


def test_series_routed_methods(both):
    m, p = both
    lab = m.set_index("n_nationkey")["n_name"]
    labp = p.set_index("n_nationkey")["n_name"]
    assert lab.sort_index().to_pandas().tolist() == labp.sort_index().tolist()
    assert len(lab.drop([0, 1])) == len(labp.drop([0, 1]))
    assert lab.reset_index().to_pandas().shape == labp.reset_index().shape
    got = m["n_nationkey"].divmod(3)
    exp = p["n_nationkey"].divmod(3)
    assert got[0].to_pandas().tolist() == list(exp[0])
    assert got[1].to_pandas().tolist() == list(exp[1])
    assert m["n_nationkey"].combine_first(m["n_regionkey"]).to_pandas().tolist() == \
        p["n_nationkey"].combine_first(p["n_regionkey"]).tolist()
    assert m["n_name"].head(1).item() == p["n_name"].head(1).item()
    assert m["n_regionkey"].equals(m["n_regionkey"]) and not m["n_regionkey"].equals(m["n_nationkey"])
    assert m["n_regionkey"].size == p["n_regionkey"].size
    assert m["n_regionkey"].shape == p["n_regionkey"].shape


def test_str_extractall_get_dummies(both):
    m, p = both
    e = m["n_name"].str.extractall(r"(\d+)").to_pandas()
    ep = p["n_name"].str.extractall(r"(\d+)")
    assert e[0].tolist() == ep[0].tolist()
    d = m["n_name"].str.get_dummies("_").to_pandas()
    dp = p["n_name"].str.get_dummies("_")
    assert sorted(d.columns) == sorted(dp.columns)
    assert (d[sorted(d.columns)].values == dp[sorted(dp.columns)].values).all()


def test_timedelta_accessors(spark):
    import modin_spark.pandas as mpd

    ev = mpd.read_parquet(f"{SF}/events.parquet")
    pv = pd.read_parquet(f"{SF}/events.parquet")
    td, tdp = ev["ts"] - ev["ts"].shift(1), pv["ts"] - pv["ts"].shift(1)
    assert td.dt.microseconds.to_pandas().tolist()[1:50] == tdp.dt.microseconds.tolist()[1:50]
    assert td.dt.days.to_pandas().tolist()[1:50] == tdp.dt.days.tolist()[1:50]
    assert td.dt.seconds.to_pandas().tolist()[1:50] == tdp.dt.seconds.tolist()[1:50]
    np.testing.assert_allclose(
        td.dt.total_seconds().to_pandas().values[1:50], tdp.dt.total_seconds().values[1:50]
    )


def test_agg_dict_scalar_returns_series(spark, mdf, pdf):
    import pandas as pd

    got = mdf.agg({"a": "sum", "b": "mean"})
    ref = pdf.agg({"a": "sum", "b": "mean"})
    pd.testing.assert_series_equal(got, ref, check_dtype=False, check_names=False)


def test_apply_args_kwds(spark, mdf, pdf):
    import pandas as pd

    sub_m, sub_p = mdf[["a", "b"]], pdf[["a", "b"]]
    pd.testing.assert_frame_equal(
        sub_m.apply(lambda s, k: s * k, args=(2,)).to_pandas(),
        sub_p.apply(lambda s, k: s * k, args=(2,)), check_dtype=False,
    )
    pd.testing.assert_series_equal(
        mdf.a.apply(lambda x, k: x + k, args=(3,)).to_pandas(),
        pdf.a.apply(lambda x, k: x + k, args=(3,)), check_dtype=False, check_names=False,
    )


def test_nunique_axis1(spark, mdf, pdf):
    import pandas as pd

    sub_m, sub_p = mdf[["a", "b"]], pdf[["a", "b"]]
    pd.testing.assert_series_equal(
        sub_m.nunique(axis=1).to_pandas(), sub_p.nunique(axis=1),
        check_dtype=False, check_names=False,
    )


def test_quantile_list(spark, mdf, pdf):
    import pandas as pd

    got = mdf[["a", "b"]].quantile([0.25, 0.75])
    ref = pdf[["a", "b"]].quantile([0.25, 0.75])
    pd.testing.assert_frame_equal(got, ref, check_dtype=False, check_names=False)


def test_seriesgroupby_agg_list_flat(spark, mdf, pdf):
    import pandas as pd

    got = mdf.groupby("k")["b"].agg(["sum", "max"]).to_pandas()
    ref = pdf.groupby("k")["b"].agg(["sum", "max"])
    pd.testing.assert_frame_equal(got, ref, check_dtype=False, check_names=False)


def test_groupby_agg_callable(spark, mdf, pdf):
    import pandas as pd

    got = mdf.groupby("k").agg(rng=("b", lambda s: s.max() - s.min()), tot=("a", "sum")).to_pandas()
    ref = pdf.groupby("k").agg(rng=("b", lambda s: s.max() - s.min()), tot=("a", "sum"))
    pd.testing.assert_frame_equal(got, ref, check_dtype=False, check_names=False)


def test_str_cat(spark, mdf, pdf):
    import pandas as pd

    assert mdf.k.str.cat(sep="-") == pdf.k.str.cat(sep="-")
    pd.testing.assert_series_equal(
        mdf.k.str.cat(mdf.s, sep="_").to_pandas(), pdf.k.str.cat(pdf.s, sep="_"),
        check_dtype=False, check_names=False,
    )


def test_mask_where_frame_cond(spark, mdf, pdf):
    import pandas as pd

    sub_m, sub_p = mdf[["a", "b"]], pdf[["a", "b"]]
    pd.testing.assert_frame_equal(
        sub_m.mask(sub_m > 50, 0).to_pandas(), sub_p.mask(sub_p > 50, 0), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        sub_m.where(sub_m > 50, -1).to_pandas(), sub_p.where(sub_p > 50, -1), check_dtype=False
    )


def test_loc_datetime_string_slice(spark):
    import numpy as np
    import pandas as pd

    import modin_spark.pandas as mpd

    idx = pd.date_range("2024-01-01", periods=20, freq="7h")
    pdf2 = pd.DataFrame({"v": np.arange(20.0)}, index=idx)
    mdf2 = mpd.from_pandas(pdf2)
    pd.testing.assert_frame_equal(
        mdf2.loc["2024-01-02":"2024-01-04"].to_pandas(),
        pdf2.loc["2024-01-02":"2024-01-04"], check_dtype=False, check_freq=False,
    )
    pd.testing.assert_frame_equal(
        mdf2.loc["2024-01-03":].to_pandas(), pdf2.loc["2024-01-03":],
        check_dtype=False, check_freq=False,
    )


def test_binary_series_axis(spark):
    import pandas as pd

    import modin_spark.pandas as mpd

    p2 = pd.DataFrame({"v": [1.0, 2, 3], "w": [4.0, 5, 6]})
    m2 = mpd.from_pandas(p2)
    pd.testing.assert_frame_equal(
        m2.add(m2.v, axis=0).to_pandas(), p2.add(p2.v, axis=0), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        m2.sub(m2.w, axis="index").to_pandas(), p2.sub(p2.w, axis="index"), check_dtype=False
    )


# ---------------------------------------------------------------------------
# module-level namespace completion (round 4b)
# ---------------------------------------------------------------------------

def test_from_dummies_roundtrip(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"k": [1, 2, 3, 4], "col": ["a", "b", "a", "c"]})
    d = mpd.from_pandas(pdf)
    dm = mpd.get_dummies(d[["col"]])
    back = mpd.from_dummies(dm, sep="_")
    assert back.to_pandas()["col"].tolist() == ["a", "b", "a", "c"]


def test_from_dummies_default_category(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"x_a": [1, 0, 0], "x_b": [0, 1, 0]})
    out = mpd.from_dummies(mpd.from_pandas(pdf), sep="_", default_category="z")
    want = pd.from_dummies(pdf, sep="_", default_category="z")
    assert out.to_pandas()["x"].tolist() == want["x"].tolist()


def test_module_pivot_matches_pandas(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"i": [1, 1, 2, 2], "c": ["x", "y", "x", "y"], "v": [1.0, 2.0, 3.0, 4.0]})
    got = mpd.pivot(mpd.from_pandas(pdf), index="i", columns="c", values="v").to_pandas()
    want = pd.pivot(pdf, index="i", columns="c", values="v")
    pd.testing.assert_frame_equal(
        got.sort_index(), want.sort_index(), check_names=False, check_column_type=False
    )


def test_to_timedelta_numeric_series(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"s": [1.5, 90.0, 0.0]})
    got = mpd.to_timedelta(mpd.from_pandas(pdf)["s"], unit="s").to_pandas()
    want = pd.to_timedelta(pdf["s"], unit="s")
    assert list(got) == list(want)


def test_lreshape_matches_pandas(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"hr1": [514, 573], "hr2": [545, 526], "team": ["Red", "Blue"]})
    got = mpd.lreshape(mpd.from_pandas(pdf), {"hr": ["hr1", "hr2"]}).to_pandas()
    want = pd.lreshape(pdf, {"hr": ["hr1", "hr2"]})
    assert sorted(got["hr"].tolist()) == sorted(want["hr"].tolist())
    assert set(got.columns) == set(want.columns)


def test_factorize_and_scalars(spark):
    import numpy as np

    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"c": ["b", "a", "b", "c"]})
    codes, uniq = mpd.factorize(mpd.from_pandas(pdf)["c"], sort=True)
    w_codes, w_uniq = pd.factorize(pdf["c"], sort=True)
    assert np.array_equal(codes, w_codes) and list(uniq) == list(w_uniq)
    # pandas scalar/dtype re-exports behave identically
    assert mpd.Timestamp("2024-01-01") == pd.Timestamp("2024-01-01")
    assert mpd.isna(mpd.NaT) and mpd.Timedelta("1h") == pd.Timedelta("1h")
    assert list(mpd.date_range("2024-01-01", periods=3)) == list(pd.date_range("2024-01-01", periods=3))


def test_read_sql_table_and_query(spark, tmp_path):
    import sqlite3

    import modin_spark.pandas as mpd

    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    try:
        pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_sql("t1", con, index=False)
        got = mpd.read_sql_table("t1", con).to_pandas()
        assert got["a"].tolist() == [1, 2, 3]
        got2 = mpd.read_sql_query("SELECT a FROM t1 WHERE a > 1", con).to_pandas()
        assert got2["a"].tolist() == [2, 3]
    finally:
        con.close()


def test_concat_keys_hierarchical(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [1, 2], "b": [3.0, 4.0]})
    d = mpd.from_pandas(pdf)
    got = mpd.concat([d, d], keys=["x", "y"]).to_pandas()
    want = pd.concat([pdf, pdf], keys=["x", "y"])
    assert list(got.index) == list(want.index) and (got.values == want.values).all()
    pdf2 = pdf.set_index("a")
    got2 = mpd.concat([mpd.from_pandas(pdf2)] * 2, keys=["x", "y"], names=["grp"]).to_pandas()
    want2 = pd.concat([pdf2] * 2, keys=["x", "y"], names=["grp"])
    assert list(got2.index) == list(want2.index)
    assert list(got2.index.names) == list(want2.index.names)


def test_merge_validate(spark):
    import modin_spark.pandas as mpd

    d = mpd.from_pandas(pd.DataFrame({"a": [1, 2], "b": [3.0, 4.0]}))
    dup = mpd.from_pandas(pd.DataFrame({"a": [1, 1], "c": [5, 6]}))
    assert len(mpd.merge(d, d, on="a", validate="1:1").to_pandas()) == 2
    assert len(mpd.merge(d, dup, on="a", validate="1:m").to_pandas()) == 2
    for v in ("1:1", "m:1"):
        with pytest.raises(pd.errors.MergeError):
            mpd.merge(d, dup, on="a", validate=v)
    with pytest.raises(ValueError):
        mpd.merge(d, d, on="a", validate="bogus")


def test_gaussian_win_type_closed_form(spark):
    """rolling(win_type='gaussian').mean(std=1): scipy-free closed-form
    weights exp(-0.5((n-c)/std)^2), parameter accepted at the agg call."""
    import numpy as np

    import modin_spark.pandas as mpd

    vals = [1.0, 2.0, 4.0, 8.0, 16.0, 5.0]
    d = mpd.from_pandas(pd.DataFrame({"b": vals}))
    got = d["b"].rolling(3, win_type="gaussian").mean(std=1.0).to_pandas().to_numpy()
    w = np.exp(-0.5 * ((np.arange(3) - 1.0)) ** 2)
    want = [np.nan, np.nan] + [float(np.dot(vals[i-2:i+1], w) / w.sum()) for i in range(2, 6)]
    assert np.allclose(got[2:], want[2:]) and np.isnan(got[:2]).all()


def test_dtypes_are_numpy_dtypes(spark):
    import numpy as np

    import modin_spark.pandas as mpd

    d = mpd.from_pandas(pd.DataFrame({"a": [1], "b": [1.5], "c": ["x"]}))
    assert all(isinstance(v, np.dtype) for v in d.dtypes.values)
    assert d["a"].dtype.kind == "i" and d.dtypes["b"] == "float64"


def test_rolling_on_and_getitem(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=8, freq="12h"),
                        "b": [1.0, 2, 3, 4, 5, 6, 7, 8]})
    d = mpd.from_pandas(pdf)
    got = d.rolling("2D", on="ts")["b"].sum().to_pandas()
    want = pdf.rolling("2D", on="ts")["b"].sum()
    assert np.allclose(got.to_numpy(), want.to_numpy())
    got2 = d.rolling(3)["b"].mean().to_pandas()
    want2 = pdf.rolling(3)["b"].mean()
    assert np.allclose(got2.fillna(-1).to_numpy(), want2.fillna(-1).to_numpy())


def test_idxmax_idxmin_axis1(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [3.0, 1, 2, np.nan], "b": [1.0, 2, 3, np.nan], "c": [2.0, 5, 1, np.nan]})
    d = mpd.from_pandas(pdf)
    assert d.idxmax(axis=1).to_pandas().tolist()[:3] == pdf.idxmax(axis=1).tolist()[:3]
    assert d.idxmin(axis=1).to_pandas().tolist()[:3] == pdf.idxmin(axis=1).tolist()[:3]
    assert d.idxmax(axis=1).to_pandas().tolist()[3] is None  # all-NaN row


def test_cut_labels_false(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [3.0, 1, 2, np.nan]})
    got = mpd.cut(mpd.from_pandas(pdf)["a"], 2, labels=False).to_pandas()
    want = pd.cut(pdf["a"], 2, labels=False)
    assert got.fillna(-1).tolist() == want.fillna(-1).tolist()


def test_str_split_expand(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"s": ["x,y", "z", "p,q,r"]})
    got = mpd.from_pandas(pdf)["s"].str.split(",", expand=True).to_pandas()
    want = pdf["s"].str.split(",", expand=True)
    assert got.fillna("0").values.tolist() == want.fillna("0").values.tolist()
    assert list(got.columns) == list(want.columns)


def test_axis1_reductions_and_transforms(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [1.0, 2, np.nan], "b": [3.0, 1, 5], "c": [2.0, 2, 1]})
    d = mpd.from_pandas(pdf)
    for g, w in [
        (d.std(axis=1), pdf.std(axis=1)),
        (d.var(axis=1), pdf.var(axis=1)),
        (d.median(axis=1), pdf.median(axis=1)),
        (d.quantile(0.25, axis=1), pdf.quantile(0.25, axis=1)),
        (d.agg("sum", axis=1), pdf.agg("sum", axis=1)),
    ]:
        assert np.allclose(
            np.nan_to_num(g.to_pandas().to_numpy(dtype=float), nan=-9),
            np.nan_to_num(np.asarray(w, dtype=float), nan=-9),
        )
    assert np.allclose(d.rank(axis=1).to_pandas().fillna(-9).values, pdf.rank(axis=1).fillna(-9).values)
    assert np.allclose(d.cumsum(axis=1).to_pandas().fillna(-9).values, pdf.cumsum(axis=1).fillna(-9).values)
    assert np.allclose(d.cummax(axis=1).to_pandas().fillna(-9).values, pdf.cummax(axis=1).fillna(-9).values)


def test_sort_key_sample_weights_clip_round_dot(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"k": ["x", "y", "x", "y"], "a": [1.0, 2, 3, 4], "b": [4.0, 3, 2, 1]})
    d = mpd.from_pandas(pdf)
    assert (d.sort_values("k", key=lambda s: s.str.upper()).to_pandas()["k"].tolist()
            == pdf.sort_values("k", key=lambda s: s.str.upper())["k"].tolist())
    pdf2 = pd.DataFrame({"v": range(100), "w": [0.0] * 50 + [1.0] * 50})
    got = mpd.from_pandas(pdf2).sample(n=20, weights="w", random_state=7).to_pandas()
    assert len(got) == 20 and (got["v"] >= 50).all()  # zero-weight rows excluded
    assert d["a"].clip(lower=d["b"]).to_pandas().tolist() == pdf["a"].clip(lower=pdf["b"]).tolist()
    r = mpd.from_pandas(pd.DataFrame({"a": [1.234], "b": [5.678]})).round({"a": 1}).to_pandas()
    assert r.values.tolist() == [[1.2, 5.678]]
    m = pd.DataFrame([[1.0, 2.0], [3.0, 4.0]], index=["a", "b"], columns=["p", "q"])
    got_d = d[["a", "b"]].dot(m).to_pandas()
    assert np.allclose(got_d.values, pdf[["a", "b"]].dot(m).values) and list(got_d.columns) == ["p", "q"]


def test_rank_pct_topk_keep_shift_axis1_dummies(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"k": ["x", "y", "x", "y", "x"], "a": [1.0, 2, 3, 3, 5]})
    d = mpd.from_pandas(pdf)
    assert (d.groupby("k")["a"].rank(pct=True).to_pandas().tolist()
            == pdf.groupby("k")["a"].rank(pct=True).tolist())
    pdf2 = pd.DataFrame({"v": [5.0, 4, 4, 3, 1]})
    d2 = mpd.from_pandas(pdf2)
    assert sorted(d2.nlargest(2, "v", keep="all").to_pandas()["v"]) == sorted(
        pdf2.nlargest(2, "v", keep="all")["v"])
    assert sorted(d2.nsmallest(2, "v", keep="all").to_pandas()["v"]) == sorted(
        pdf2.nsmallest(2, "v", keep="all")["v"])
    two = d[["a"]].assign(b=d["a"] * 2)
    ptwo = pdf[["a"]].assign(b=pdf["a"] * 2)
    assert (two.shift(1, axis=1).to_pandas().fillna(-9).values.tolist()
            == ptwo.shift(1, axis=1).fillna(-9).values.tolist())
    pdf3 = pd.DataFrame({"k": ["x", None, "y"]})
    gn = mpd.get_dummies(mpd.from_pandas(pdf3), dummy_na=True).to_pandas()
    wn = pd.get_dummies(pdf3, dummy_na=True, dtype="int64")
    assert gn.values.tolist() == wn.values.tolist() and list(gn.columns) == list(wn.columns)
    gd = mpd.get_dummies(d[["k"]], drop_first=True).to_pandas()
    wd = pd.get_dummies(pdf[["k"]], drop_first=True, dtype="int64")
    assert gd.values.tolist() == wd.values.tolist()


def test_where_mask_frame_other_and_replace_merge(spark):
    import modin_spark.pandas as mpd

    pdf = pd.DataFrame({"a": [1.0, np.nan, 3], "b": [5.0, 1, 0], "s": ["ab1", "cd2", "ef3"],
                        "k": ["x", "y", "x"]})
    d = mpd.from_pandas(pdf)
    num = ["a", "b"]
    got = d[num].where(d[num] > 1, -d[num]).to_pandas()
    want = pdf[num].where(pdf[num] > 1, -pdf[num])
    assert got.fillna(-9).values.tolist() == want.fillna(-9).values.tolist()
    got2 = d["a"].where(d["a"] > 1, d["b"]).to_pandas()
    assert got2.fillna(-9).tolist() == pdf["a"].where(pdf["a"] > 1, pdf["b"]).fillna(-9).tolist()
    # str.replace case-insensitive literal; Series.replace(regex=True)
    assert (d["s"].str.replace("AB", "z", case=False, regex=False).to_pandas().tolist()
            == pdf["s"].str.replace("AB", "z", case=False, regex=False).tolist())
    assert (d["s"].replace(r"\d", "", regex=True).to_pandas().tolist()
            == pdf["s"].replace(r"\d", "", regex=True).tolist())
    # merge with left_on + right_index
    m = d.merge(d.set_index("k")[["a"]], left_on="k", right_index=True, suffixes=("", "_r")).to_pandas()
    wm = pdf.merge(pdf.set_index("k")[["a"]], left_on="k", right_index=True, suffixes=("", "_r"))
    assert len(m) == len(wm) and sorted(m.columns) == sorted(wm.columns)
    assert np.allclose(sorted(m["a_r"].fillna(-9)), sorted(wm["a_r"].fillna(-9)))
    # unary minus / invert
    assert (-d[num]).to_pandas().fillna(-9).values.tolist() == (-pdf[num]).fillna(-9).values.tolist()
    assert (~(d[num] > 1)).to_pandas().values.tolist() == (~(pdf[num] > 1)).values.tolist()
