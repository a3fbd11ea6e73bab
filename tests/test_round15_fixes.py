"""Round-15 fixes: ADVICE r14 punch list + VERDICT r14 "what's wrong/missing",
differential vs pandas (reference test model: modin's test_series /
test_groupby suites)."""
import warnings

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd

warnings.filterwarnings("ignore")


def eq_series(m, p):
    g = m.to_pandas() if hasattr(m, "to_pandas") else m
    pd.testing.assert_series_equal(g, p, check_dtype=False, check_index_type=False,
                                   check_freq=False, check_categorical=False)


def eq_frame(m, p):
    g = m.to_pandas() if hasattr(m, "to_pandas") else m
    pd.testing.assert_frame_equal(g, p, check_dtype=False, check_index_type=False,
                                  check_freq=False, check_categorical=False)


# ---------------------------------------------------------- ADVICE high #1
def test_rank_with_subnormals():
    """order_bucket_sql: pow(2, 6-e) overflowed to +inf for e <= -1018, so
    every double with |v| < ~3.6e-307 got a sign-inverted bucket — ranks
    were wrong for the WHOLE column whenever one tiny value was present."""
    vals = [1e-310, -3.2, 5e-320, 0.0, 2.5, -1e-312, 7.0, 3.6e-307]
    eq_series(mpd.Series(vals).rank(), pd.Series(vals).rank())
    eq_series(mpd.Series(vals).rank(method="min"), pd.Series(vals).rank(method="min"))
    # mixed with inf/NaN (the r14 fix covered only the +/-inf side)
    vals2 = [1e-310, float("inf"), float("nan"), -5e-315, float("-inf"), 1.0]
    eq_series(mpd.Series(vals2).rank(), pd.Series(vals2).rank())


def test_sort_values_with_subnormals():
    p = pd.DataFrame({"t": [1e-310, 2.0, 5e-320, -1e-320, 1.0, 2.2e-308],
                      "v": [1, 2, 3, 4, 5, 6]})
    m = mpd.DataFrame(p)
    assert m.sort_values("t").to_pandas()["v"].tolist() == \
        p.sort_values("t")["v"].tolist()


def test_merge_asof_with_subnormals():
    left = pd.DataFrame({"t": [5e-320, 1e-310, 1.0, 2.0]}).sort_values("t")
    right = pd.DataFrame({"t": [1e-315, 0.5, 1.5], "v": [10, 20, 30]}).sort_values("t")
    p = pd.merge_asof(left, right, on="t")
    m = mpd.merge_asof(mpd.DataFrame(left), mpd.DataFrame(right), on="t")
    eq_frame(m.reset_index(drop=True), p.reset_index(drop=True))


# ------------------------------------------------- What's wrong #1: null keys
@pytest.fixture(scope="module")
def nullkey():
    p = pd.DataFrame({"k": ["a", "b", None, "c", "b", "a"],
                      "w": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]})
    return p, mpd.DataFrame(p)


@pytest.mark.parametrize("op", ["mean", "sum", "size", "nunique", "first",
                                "any", "max"])
def test_nullkey_transform_aggs(nullkey, op):
    p, m = nullkey
    eq_series(m.groupby("k").w.transform(op), p.groupby("k").w.transform(op))


@pytest.mark.parametrize("meth", ["cumsum", "cumprod", "cummax", "cummin",
                                  "rank", "shift", "diff", "ffill", "bfill",
                                  "pct_change"])
def test_nullkey_window_methods(nullkey, meth):
    p, m = nullkey
    eq_series(getattr(m.groupby("k").w, meth)(), getattr(p.groupby("k").w, meth)())


def test_nullkey_cumcount(nullkey):
    p, m = nullkey
    eq_series(m.groupby("k").cumcount(), p.groupby("k").cumcount())


def test_nullkey_callable_transform(nullkey):
    p, m = nullkey
    eq_series(m.groupby("k").w.transform(lambda s: s - s.mean()),
              p.groupby("k").w.transform(lambda s: s - s.mean()))


def test_nullkey_row_selectors(nullkey):
    p, m = nullkey
    for n in (1, 2):
        assert sorted(m.groupby("k").head(n).to_pandas()["w"]) == \
            sorted(p.groupby("k").head(n)["w"])
        assert sorted(m.groupby("k").tail(n).to_pandas()["w"]) == \
            sorted(p.groupby("k").tail(n)["w"])
    assert sorted(m.groupby("k").nth(0).to_pandas()["w"]) == \
        sorted(p.groupby("k").nth(0)["w"])
    assert sorted(m.groupby("k").nth[:1].to_pandas()["w"]) == \
        sorted(p.groupby("k").nth[:1]["w"])


def test_nullkey_filter_and_apply(nullkey):
    p, m = nullkey
    assert sorted(m.groupby("k").filter(lambda d: d.w.sum() > 25).to_pandas()["w"]) == \
        sorted(p.groupby("k").filter(lambda d: d.w.sum() > 25)["w"])
    pa = p.groupby("k").apply(lambda d: d.w.sum(), include_groups=False)
    ma = m.groupby("k").apply(lambda d: d.w.sum(), include_groups=False)
    eq_series(ma, pa)


def test_nullkey_dropna_false_unchanged(nullkey):
    p, m = nullkey
    eq_series(m.groupby("k", dropna=False).w.cumsum(),
              p.groupby("k", dropna=False).w.cumsum())
    eq_series(m.groupby("k", dropna=False).w.transform("mean"),
              p.groupby("k", dropna=False).w.transform("mean"))
    eq_series(m.groupby("k", dropna=False).w.rank(),
              p.groupby("k", dropna=False).w.rank())


def test_nullkey_multikey_transform():
    p = pd.DataFrame({"k1": ["a", "a", None, "b"], "k2": [1.0, None, 1.0, 1.0],
                      "w": [1.0, 2.0, 3.0, 4.0]})
    m = mpd.DataFrame(p)
    eq_series(m.groupby(["k1", "k2"]).w.transform("sum"),
              p.groupby(["k1", "k2"]).w.transform("sum"))
    eq_series(m.groupby(["k1", "k2"]).w.cumsum(),
              p.groupby(["k1", "k2"]).w.cumsum())


def test_nullkey_unique_order():
    p = pd.DataFrame({"k": ["b", "a", None, "a"], "w": [1.0, 2.0, 3.0, 1.0]})
    m = mpd.DataFrame(p)
    got = m.groupby("k").w.unique().to_pandas()
    want = p.groupby("k").w.unique()
    assert list(got.index) == list(want.index)
    assert [list(x) for x in got] == [list(x) for x in want]
    got_ns = m.groupby("k", sort=False).w.unique().to_pandas()
    assert list(got_ns.index) == ["b", "a"]


# ----------------------------------------- What's missing #1: include_groups
def test_apply_include_groups_false():
    p = pd.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    m = mpd.DataFrame(p)
    pa = p.groupby("k").apply(lambda d: d.sum(), include_groups=False)
    ma = m.groupby("k").apply(lambda d: d.sum(), include_groups=False)
    eq_frame(ma, pa)


def test_apply_include_groups_true_warns():
    m = mpd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m.groupby("k").apply(lambda d: d.v.sum())
    assert any(issubclass(w.category, DeprecationWarning) for w in rec)


# ----------------------------------------------- What's wrong #2: bool cumsum
def test_bool_cumsum_cumprod():
    p = pd.Series([1.0, 5.0, 2.0, 8.0, 3.0])
    m = mpd.Series(p)
    eq_series((m > 2).cumsum(), (p > 2).cumsum())
    eq_series((m > 2).cumprod(), (p > 2).cumprod())
    eq_series((m > 2).cummax(), (p > 2).cummax())
    eq_series((m > 2).cummin(), (p > 2).cummin())


def test_bool_cumsum_frame():
    p = pd.DataFrame({"a": [True, False, True], "b": [False, False, True]})
    m = mpd.DataFrame(p)
    eq_frame(m.cumsum(), p.cumsum())


# ------------------------------------------------- What's wrong #3: isin NaN
def test_isin_nan_float():
    p = pd.Series([1.0, np.nan, 3.0])
    m = mpd.Series(p)
    eq_series(m.isin([1.0, np.nan]), p.isin([1.0, np.nan]))
    eq_series(m.isin([np.nan]), p.isin([np.nan]))
    # pandas: None does NOT match float NaN
    eq_series(m.isin([None]), p.isin([None]))
    eq_series(m.isin([3.0]), p.isin([3.0]))


def test_isin_none_object():
    p = pd.Series(["a", None, "b"])
    m = mpd.Series(p)
    eq_series(m.isin(["a", None]), p.isin(["a", None]))
    eq_series(m.isin([None]), p.isin([None]))
    eq_series(m.isin(["b"]), p.isin(["b"]))


def test_frame_isin_missing():
    p = pd.DataFrame({"x": [1.0, np.nan], "y": ["u", None]})
    m = mpd.DataFrame(p)
    eq_frame(m.isin([np.nan, "u"]), p.isin([np.nan, "u"]))
    eq_frame(m.isin([None, 1.0]), p.isin([None, 1.0]))
    eq_frame(m.isin({"x": [np.nan], "y": [None]}), p.isin({"x": [np.nan], "y": [None]}))


def test_isin_nan_filter_roundtrip():
    """The silent-wrong-answer case: a filter deliberately selecting missing."""
    p = pd.DataFrame({"v": [1.0, np.nan, 2.0, np.nan]})
    m = mpd.DataFrame(p)
    eq_frame(m[m.v.isin([np.nan])].reset_index(drop=True),
             p[p.v.isin([np.nan])].reset_index(drop=True))


# --------------------------------------- What's missing #2: corr min_periods
def test_corr_cov_min_periods():
    p = pd.DataFrame({"a": [1.0, 2.0, np.nan, 4.0, 5.0],
                      "b": [2.0, np.nan, np.nan, 8.0, 1.0],
                      "c": [1.0, 1.0, 2.0, 3.0, 5.0]})
    m = mpd.DataFrame(p)
    for mp in (None, 3, 4, 5):
        got = m.corr(min_periods=mp)
        want = p.corr(min_periods=mp)
        assert np.allclose(got.values, want.values, equal_nan=True)
    got = m.cov(min_periods=4)
    want = p.cov(min_periods=4)
    assert np.allclose(got.values, want.values, equal_nan=True)
    got = m.corr(method="spearman", min_periods=5)
    want = p.corr(method="spearman", min_periods=5)
    assert np.allclose(got.values, want.values, equal_nan=True)


# ------------------------------------------ What's missing #3: sample(n>len)
def test_sample_oversize_raises():
    m = mpd.DataFrame({"v": [1, 2, 3]})
    with pytest.raises(ValueError, match="larger sample than population"):
        m.sample(n=10)
    assert len(m.sample(n=10, replace=True).to_pandas()) == 10
    assert len(m.sample(n=2).to_pandas()) == 2


# --------------------------------------------- config: env write-through etc.
def test_env_var_fires_on_put(monkeypatch):
    """ADVICE medium: env-sourced get() must run the write-through hook."""
    import modin_spark.config as cfg

    import os

    from modin_spark.config import _UNSET

    monkeypatch.setenv("MODIN_NPARTITIONS", "13")
    old_v, old_src = cfg.NPartitions._value, cfg.NPartitions._value_source
    old_env = os.environ.get("MODIN_SPARK_SHUFFLE_PARTITIONS")
    try:
        cfg.NPartitions._value = _UNSET
        assert cfg.NPartitions.get() == 13
        # the hook mirrors the choice into the session-build env var
        assert os.environ.get("MODIN_SPARK_SHUFFLE_PARTITIONS") == "13"
    finally:
        cfg.NPartitions._value, cfg.NPartitions._value_source = old_v, old_src
        if old_env is None:
            os.environ.pop("MODIN_SPARK_SHUFFLE_PARTITIONS", None)
        else:
            os.environ["MODIN_SPARK_SHUFFLE_PARTITIONS"] = old_env


def test_context_restores_none():
    """ADVICE low: context() restore must not stringify a prior None."""
    import modin_spark.config as cfg

    assert cfg.AsvDataSizeConfig.get() is None
    with cfg.context(AsvDataSizeConfig="abc"):
        assert cfg.AsvDataSizeConfig.get() == "abc"
    assert cfg.AsvDataSizeConfig.get() is None


def test_normalize_none_identity():
    import modin_spark.config as cfg

    assert cfg.AsvDataSizeConfig.normalize(None) is None


# ------------------------------------- What's missing #4: 4:2:0 JPEG decode
def test_jpeg420_roundtrip_exact():
    """encode_jpeg_color420 -> decode_jpeg_baseline reproduces the reference
    reconstruction (IDCT + 2x nearest chroma doubling + T.871 RGB) exactly."""
    from modin_spark.operators import media_codecs as mc

    rng = np.random.default_rng(7)
    h, w = 24, 20
    my, mx = (h + 15) // 16, (w + 15) // 16
    qy = np.full((8, 8), 4, dtype=np.int64)
    qy[0, 0] = 8
    qc = np.full((8, 8), 6, dtype=np.int64)
    cy = rng.integers(-20, 20, size=(2 * my, 2 * mx, 8, 8))
    cy = np.where(rng.random(cy.shape) < 0.8, 0, cy)
    cy[:, :, 0, 0] = rng.integers(-100, 100, size=(2 * my, 2 * mx))
    cb = np.where(rng.random((my, mx, 8, 8)) < 0.9, 0,
                  rng.integers(-10, 10, size=(my, mx, 8, 8)))
    cr = np.where(rng.random((my, mx, 8, 8)) < 0.9, 0,
                  rng.integers(-10, 10, size=(my, mx, 8, 8)))
    data = mc.encode_jpeg_color420(cy, cb, cr, w, h, qy, qc)
    meta = mc.jpeg_meta(data)
    assert (meta["width"], meta["height"], meta["components"]) == (w, h, 3)
    img = mc.decode_jpeg_baseline(data)
    assert img.shape == (h, w, 3) and img.dtype == np.uint8

    M = mc._IDCT_M

    def plane(coeffs, q):
        by, bx = coeffs.shape[:2]
        p = np.empty((by * 8, bx * 8))
        for r in range(by):
            for c in range(bx):
                p[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = (
                    M.T @ (coeffs[r, c] * q).astype(float) @ M + 128)
        return p

    y = plane(cy, qy)
    cbp = np.repeat(np.repeat(plane(cb, qc), 2, 0), 2, 1) - 128
    crp = np.repeat(np.repeat(plane(cr, qc), 2, 0), 2, 1) - 128
    rgb = np.stack([y + 1.402 * crp,
                    y - 0.344136 * cbp - 0.714136 * crp,
                    y + 1.772 * cbp], -1)
    ref = np.clip(np.round(rgb), 0, 255).astype(np.uint8)[:h, :w]
    assert np.array_equal(img, ref)


def test_jpeg_gray_and_444_still_decode():
    from modin_spark.operators import media_codecs as mc

    q = np.full((8, 8), 8, dtype=np.int64)
    c = np.zeros((2, 2, 8, 8), dtype=np.int64)
    c[:, :, 0, 0] = [[5, -3], [7, 1]]
    g = mc.encode_jpeg_baseline(c, 16, 16, q)
    img = mc.decode_jpeg_baseline(g)
    assert img.shape == (16, 16)
    c3 = np.stack([c, c, c])
    col = mc.encode_jpeg_color444(c3, 16, 16, q, q)
    assert mc.decode_jpeg_baseline(col).shape == (16, 16, 3)


def test_image_channel_stats_grayscale_broadcast():
    """image_channel_stats on a grayscale payload broadcasts the channel."""
    from modin_spark.operators import media_codecs as mc
    from modin_spark.operators.multimodal import image_channel_stats
    from modin_spark.session import get_spark

    q = np.full((8, 8), 8, dtype=np.int64)
    c = np.zeros((1, 1, 8, 8), dtype=np.int64)
    c[0, 0, 0, 0] = 10
    payload = mc.encode_jpeg_baseline(c, 8, 8, q)
    spark = get_spark()
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    row = image_channel_stats(df).collect()[0]
    assert row.width == 8 and row.height == 8
    assert row.mean_r == row.mean_g == row.mean_b == 138.0


def test_grouped_resample_attr_narrowing_grid():
    """r.w.sum() must keep the resampler's grid completion (empty interior
    buckets fill 0 for sum/count), same as r['w'].sum()."""
    p = pd.DataFrame({"k": ["a", "b", None, "a", "b", "a"],
                      "t": pd.date_range("2024-01-01", periods=6, freq="h"),
                      "w": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]}).set_index("t")
    m = mpd.DataFrame(p.reset_index()).set_index("t")
    want = p.groupby("k").resample("2h").w.sum()
    got = m.groupby("k").resample("2h").w.sum().to_pandas()
    assert got.tolist() == want.tolist()
    wantc = p.groupby("k").resample("2h").w.count()
    gotc = m.groupby("k").resample("2h").w.count().to_pandas()
    assert gotc.tolist() == wantc.tolist()


def test_computed_nan_float_key():
    """A COMPUTED NaN key (0/0 — Spark NaN, not NULL) must behave exactly
    like a missing key: dropped under dropna=True, ONE group (merged with
    ingested NULLs) under dropna=False."""
    p = pd.DataFrame({"a": [1.0, 2.0, 0.0, 4.0], "b": [1.0, 1.0, 0.0, 2.0],
                      "w": [10.0, 20.0, 30.0, 40.0]})
    p["k"] = p.a / p.b
    m = mpd.DataFrame(p[["a", "b", "w"]])
    m["k"] = m.a / m.b
    eq_series(m.groupby("k").w.sum(), p.groupby("k").w.sum())
    eq_series(m.groupby("k").w.transform("sum"), p.groupby("k").w.transform("sum"))
    eq_series(m.groupby("k").w.cumsum(), p.groupby("k").w.cumsum())
    eq_series(m.groupby("k", dropna=False).w.sum(),
              p.groupby("k", dropna=False).w.sum())
    eq_series(m.groupby("k").ngroup(), p.groupby("k").ngroup())
    assert sorted(m.groupby("k").head(1).to_pandas()["w"]) == \
        sorted(p.groupby("k").head(1)["w"])


def test_series_reset_index_name_kwarg():
    """Series.reset_index(name=) names the value column (wave 51:
    previously forwarded to DataFrame.reset_index -> TypeError); pandas
    2.2 IGNORES name when drop=True."""
    s = pd.Series([1, 2], index=pd.Index(["a", "b"], name="k"), name="v")
    ms = mpd.Series([1, 2], index=pd.Index(["a", "b"], name="k"), name="v")
    pd.testing.assert_frame_equal(
        ms.reset_index(name="n").to_pandas(), s.reset_index(name="n"),
        check_dtype=False)
    eq_series(ms.reset_index(drop=True, name="x"),
              s.reset_index(drop=True, name="x"))
    # the groupby chain the probe caught
    p = pd.DataFrame({"k": ["a", None, "a"], "v": [1, 2, 3]})
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal(
        m.groupby("k", dropna=False).size().reset_index(name="n").to_pandas(),
        p.groupby("k", dropna=False).size().reset_index(name="n"),
        check_dtype=False)


def test_timedelta_cumsum():
    """Wave 51: cumsum over a timedelta column hit coalesce(interval, 0)
    DATATYPE_MISMATCH in the blocked-cumsum carry merge."""
    t = pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-02", "2024-01-10"])
    p = pd.Series(t).diff()
    m = mpd.Series(t).diff()
    eq_series(m.cumsum(), p.cumsum())


def test_timedelta_astype_str_formats():
    """Wave 51: timedelta astype(str) must render pandas' repr — floored
    days + non-negative remainder, '+' on negative days, array-wide
    day-aligned short form, per-element microsecond suffix — not Spark's
    INTERVAL literal."""
    mixed = [pd.Timedelta("2 days"), pd.Timedelta("-1 days 02:03:04"),
             pd.Timedelta("00:00:00.123456"), pd.NaT, pd.Timedelta(seconds=-1)]
    eq_series(mpd.Series(mixed).astype(str), pd.Series(mixed).astype(str))
    aligned = [pd.Timedelta("2 days"), pd.Timedelta("-5 days"), pd.NaT]
    eq_series(mpd.Series(aligned).astype(str), pd.Series(aligned).astype(str))
    dt = pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-02"])
    eq_series(mpd.Series(dt).diff().astype(str), pd.Series(dt).diff().astype(str))


def test_cat_meta_survives_assign_select_filter():
    """Wave 52: wrapper-carried categorical dtype must survive assign,
    column-subset selection, drop(columns=) and boolean row masks — the
    storage is plain string, so losing the metadata silently degrades
    observed=False groupby / value_counts / ordered sort to plain-string
    semantics."""
    cd = pd.CategoricalDtype(["a", "b", "c"])
    p = pd.DataFrame({"v": [1.0, 2.0, 3.0]})
    p["g"] = pd.Categorical(["a", "b", "a"], categories=["a", "b", "c"])
    m = mpd.DataFrame({"v": [1.0, 2.0, 3.0]}).assign(
        g=mpd.Series(["a", "b", "a"]).astype(cd))[["g", "v"]]
    eq_series(m.groupby("g", observed=False).v.sum(),
              p.groupby("g", observed=False).v.sum())
    eq_series(m.g.value_counts(), p.g.value_counts())
    sub = m[m.v > 0.5]
    assert sub.g.cat.categories.tolist() == ["a", "b", "c"]
    assert m.drop(columns="v").g.cat.categories.tolist() == ["a", "b", "c"]
    assert m.g.cat.add_categories(["d"]).cat.categories.tolist() == ["a", "b", "c", "d"]


def test_cat_sort_and_value_counts_derived():
    """Wave 52: astype-derived categoricals (no native pandas fast path)
    must sort by category order and emit zero-count categories."""
    cd = pd.CategoricalDtype(["c", "b", "a"], ordered=True)
    ps = pd.Series(["b", "a", "c"]).astype(cd)
    ms = mpd.Series(["b", "a", "c"]).astype(cd)
    assert ms.sort_values().astype(str).to_pandas().tolist() == \
        ps.sort_values().astype(str).tolist()
    cd2 = pd.CategoricalDtype(["a", "b", "z"])
    eq_series(mpd.Series(["a", "a", "b"]).astype(cd2).value_counts(),
              pd.Series(["a", "a", "b"]).astype(cd2).value_counts())


def test_crosstab_drops_null_keys():
    """Wave 52: pandas crosstab silently drops rows where either key is
    missing; a NULL index key must not surface as a NaN row label."""
    p = pd.DataFrame({"r": ["a", "a", None, "b"], "c": ["x", "y", "x", None]})
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal(
        mpd.crosstab(m.r, m.c).to_pandas(), pd.crosstab(p.r, p.c),
        check_dtype=False, check_index_type=False, check_column_type=False,
        check_names=False)


def test_tz_localize_ambiguous_nonexistent():
    """Wave 53: tz_localize(ambiguous=True/False/'NaT', nonexistent='NaT')
    — fall-back overlap walls resolve to the chosen DST/standard instant,
    spring-forward gap walls can null."""
    naive = pd.Series(pd.to_datetime([
        "2024-11-03 01:30:00",   # ambiguous (fall-back overlap, US/Eastern)
        "2024-03-10 02:30:00",   # nonexistent (spring-forward gap)
        "2024-06-15 12:00:00",   # plain
    ]))
    m = mpd.Series(naive)
    for amb in (True, False):
        exp = naive.dt.tz_localize("America/New_York", ambiguous=np.array([amb, False, False]),
                                   nonexistent="shift_forward").astype(str)
        got = m.dt.tz_localize("America/New_York", ambiguous=amb).astype(str).to_pandas()
        # only the ambiguous row differs between interpretations; compare it
        assert got.iloc[0] == exp.iloc[0], (amb, got.iloc[0], exp.iloc[0])
    nat = m.dt.tz_localize("America/New_York", ambiguous="NaT",
                           nonexistent="NaT").to_pandas()
    assert pd.isna(nat.iloc[0]) and pd.isna(nat.iloc[1]) and not pd.isna(nat.iloc[2])


def test_tz_aware_timedelta_arithmetic():
    """Wave 53: adding a Timedelta to a tz-converted series must keep the
    tz-aware rendering and add ABSOLUTE duration (wall storage round-trips
    through UTC, DST-correct)."""
    naive = pd.Series(pd.to_datetime([
        "2024-03-10 01:30:00", "2024-11-03 00:30:00", "2024-06-15 12:00:00"]))
    p = naive.dt.tz_localize("UTC").dt.tz_convert("America/New_York") + pd.Timedelta("1h")
    g = (mpd.Series(naive).dt.tz_localize("UTC").dt.tz_convert("America/New_York")
         + pd.Timedelta("1h"))
    eq_series(g.astype(str), p.astype(str))
    p2 = naive.dt.tz_localize("UTC") - pd.Timedelta("30min")
    g2 = mpd.Series(naive).dt.tz_localize("UTC") - pd.Timedelta("30min")
    eq_series(g2.astype(str), p2.astype(str))


def test_reindex_tolerance():
    """Wave 53: reindex(method=, tolerance=) bounds the fill distance."""
    p = pd.Series([1.0, 2.0], index=[0, 10])
    m = mpd.Series([1.0, 2.0], index=[0, 10])
    eq_series(m.reindex([1, 9], method="nearest", tolerance=2),
              p.reindex([1, 9], method="nearest", tolerance=2))
    eq_series(m.reindex([3, 11], method="ffill", tolerance=1),
              p.reindex([3, 11], method="ffill", tolerance=1))


def test_query_named_default_index():
    """Wave 54: query over a rename_axis-named DEFAULT index resolves to
    the global row position and the result keeps the original labels +
    index name (pandas semantics)."""
    p = pd.DataFrame({"a": [1, 2, 3, 4]}).rename_axis("ix")
    m = mpd.DataFrame({"a": [1, 2, 3, 4]}).rename_axis("ix")
    pd.testing.assert_frame_equal(m.query("ix >= 2").to_pandas(),
                                  p.query("ix >= 2"), check_dtype=False)
    # bare `index` token, unnamed default index
    p2 = pd.DataFrame({"a": [5, 6, 7]})
    m2 = mpd.DataFrame({"a": [5, 6, 7]})
    pd.testing.assert_frame_equal(m2.query("index == 1").to_pandas(),
                                  p2.query("index == 1"), check_dtype=False)


def test_get_dummies_prefix_dict_and_list():
    """Wave 54: prefix= accepts a dict keyed by column or an aligned list."""
    p = pd.DataFrame({"c": ["u", "v", "u"], "d": ["p", "q", "p"]})
    m = mpd.DataFrame(p)
    for pre in ({"c": "C", "d": "D"}, ["C", "D"]):
        pd.testing.assert_frame_equal(
            mpd.get_dummies(m, prefix=pre, prefix_sep="~").astype(int).to_pandas(),
            pd.get_dummies(p, prefix=pre, prefix_sep="~").astype(int),
            check_dtype=False)


def test_series_agg_named_kwargs():
    """Wave 54: s.agg(total='sum', hi='max') -> Series indexed by the
    output names."""
    s = pd.Series([1, 2, 3], name="v")
    got = mpd.Series([1, 2, 3], name="v").agg(total="sum", hi="max")
    pd.testing.assert_series_equal(pd.Series(got) if not isinstance(got, pd.Series) else got,
                                   s.agg(total="sum", hi="max"), check_dtype=False)


def test_python_named_groups_java_regex():
    """Wave 55: Python (?P<name>...) named groups must translate to Java
    (?<name>...) everywhere a pattern reaches the JVM, and extractall
    labels output columns by group name."""
    s = pd.Series(["a1b2", "c3", None])
    m = mpd.Series(["a1b2", "c3", None])
    pd.testing.assert_frame_equal(
        m.str.extractall(r"(?P<d>\d)").to_pandas(),
        s.str.extractall(r"(?P<d>\d)"),
        check_dtype=False, check_index_type=False)
    eq_series(m.str.count(r"(?P<d>\d)"), s.str.count(r"(?P<d>\d)"))
    eq_series(m.str.contains(r"(?P<d>\d)"), s.str.contains(r"(?P<d>\d)"))
    eq_series(m.str.findall(r"\d"), s.str.findall(r"\d"))


def test_unstack_restores_none_names():
    """Wave 55: stack().unstack() round trip must not bake the level_N
    placeholder into the result's index/columns names."""
    p = pd.DataFrame({"x": [1.0, np.nan], "y": [3.0, 4.0]}, index=["r1", "r2"])
    m = mpd.DataFrame(p)
    got = m.stack().unstack().to_pandas()
    want = p.stack().unstack()
    assert list(got.index.names) == list(want.index.names) == [None]
    assert got.columns.name is want.columns.name is None
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_read_csv_na_token_parity(tmp_path):
    """Wave 57: pandas' default NA token set + na_values list/dict null
    out in string columns, and a column that becomes numeric once its NA
    tokens are nulled re-infers as float64."""
    p = tmp_path / "na.csv"
    p.write_text("a,b\n1,x\n2,NA\nNA,miss\n")
    exp = pd.read_csv(p)
    got = mpd.read_csv(str(p)).to_pandas()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert str(got["a"].dtype) == "float64"
    exp2 = pd.read_csv(p, na_values={"b": ["miss"]})
    got2 = mpd.read_csv(str(p), na_values={"b": ["miss"]}).to_pandas()
    pd.testing.assert_frame_equal(got2, exp2, check_dtype=False)


def test_read_csv_positional_index_and_callable_skiprows(tmp_path):
    """Wave 57: index_col accepts positions; skiprows accepts a callable
    over physical line numbers."""
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,x\n2,y\n3,z\n4,w\n")
    pd.testing.assert_frame_equal(
        mpd.read_csv(str(p), index_col=0).to_pandas(),
        pd.read_csv(p, index_col=0), check_dtype=False,
        check_index_type=False)
    pd.testing.assert_frame_equal(
        mpd.read_csv(str(p), skiprows=lambda i: i > 0 and i % 2 == 0).to_pandas(),
        pd.read_csv(p, skiprows=lambda i: i > 0 and i % 2 == 0), check_dtype=False)


def test_read_json_records_lines_distributed(tmp_path):
    """Wave 57: orient='records' + lines=True is the Spark-native JSONL
    shape — it must stay distributed and read the engine's own
    directory-style to_json output (content compared order-insensitively:
    multi-file read order is the documented partition order)."""
    m = mpd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    out = str(tmp_path / "d.json")
    m.to_json(out, orient="records", lines=True)
    back = mpd.read_json(out, orient="records", lines=True).to_pandas()
    assert sorted(back["a"].tolist()) == [1, 2, 3]


def test_micol_level_names_survive():
    """Wave 58: MultiIndex-COLUMNS level names survive partial top-level
    selection, xs(axis=1), axis=0 reductions, and sort_index(axis=1,
    level=) honors the level."""
    mcols = pd.MultiIndex.from_product([["a", "b"], ["x", "y"]], names=["L0", "L1"])
    p = pd.DataFrame(np.arange(12.0).reshape(3, 4), columns=mcols)
    m = mpd.DataFrame(p)
    assert m["a"].to_pandas().columns.name == "L1"
    assert m.xs("y", axis=1, level=1).to_pandas().columns.name == "L0"
    assert list(m.sum().index.names) == ["L0", "L1"]
    assert m.sort_index(axis=1, level=1).columns.tolist() == \
        p.sort_index(axis=1, level=1).columns.tolist()


def test_pct_change_axis1():
    """Wave 58: pct_change across columns (projection, no shuffle)."""
    p = pd.DataFrame({"x": [3.0, 1.0, np.nan], "y": [1.0, 2.0, 2.0],
                      "z": [2.0, np.nan, 1.0]})
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal(
        m.pct_change(axis=1, fill_method=None).to_pandas(),
        p.pct_change(axis=1, fill_method=None), check_dtype=False)


def test_window_agg_shapes():
    """Wave 58: expanding.agg dict over a frame; ewm.agg str/list/dict."""
    p = pd.DataFrame({"x": [3.0, 1.0, 2.0], "y": [1.0, 2.0, 2.0]})
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal(
        m.expanding().agg({"x": "sum", "y": "max"}).to_pandas(),
        p.expanding().agg({"x": "sum", "y": "max"}), check_dtype=False)
    ps = pd.Series([1.0, 2.0, 3.0])
    ms = mpd.Series([1.0, 2.0, 3.0])
    pd.testing.assert_frame_equal(
        ms.ewm(span=3).agg(["mean"]).to_pandas(),
        ps.ewm(span=3).agg(["mean"]), check_dtype=False)


def test_groupby_ddof_and_interpolation():
    """Wave 59: groupby std/var/sem honor ddof (previously silently
    computed ddof=1); groupby quantile honors interpolation=."""
    p = pd.DataFrame({"g": ["x", "x", "x", "y", "y"],
                      "v": [1.0, 3.0, 4.0, 8.0, 9.0]})
    m = mpd.DataFrame(p)
    for ddof in (0, 2):
        eq_series(m.groupby("g").v.std(ddof=ddof), p.groupby("g").v.std(ddof=ddof))
        eq_series(m.groupby("g").v.var(ddof=ddof), p.groupby("g").v.var(ddof=ddof))
    for interp in ("lower", "higher", "nearest", "midpoint"):
        eq_series(m.groupby("g").v.quantile(0.5, interpolation=interp),
                  p.groupby("g").v.quantile(0.5, interpolation=interp))


def test_expanding_ddof():
    """Wave 59: expanding var/std/sem accept ddof."""
    s = pd.Series([1.0, 3.0, 4.0, 8.0, 9.0])
    m = mpd.Series([1.0, 3.0, 4.0, 8.0, 9.0])
    eq_series(m.expanding().var(ddof=0), s.expanding().var(ddof=0))
    eq_series(m.expanding().std(ddof=0), s.expanding().std(ddof=0))


def test_nunique_axis1_null_kinds():
    """Wave 59: dropna=False counts float-NaN and object-None as DISTINCT
    missing values per pandas' object-row semantics."""
    p = pd.DataFrame({"a": [1.0, 1.0, np.nan], "b": [1.0, 2.0, np.nan],
                      "c": ["u", "u", None]})
    m = mpd.DataFrame(p)
    eq_series(m.nunique(axis=1, dropna=False), p.nunique(axis=1, dropna=False))
    eq_series(m.nunique(axis=1), p.nunique(axis=1))


def test_sample_axis1_matches_pandas_rng():
    """Wave 59: sample(axis=1) replays pandas' RandomState.choice so the
    chosen columns match for a given random_state."""
    p = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0], "c": [5.0, 6.0]})
    m = mpd.DataFrame(p)
    for seed in (3, 7, 11):
        assert m.sample(n=2, axis=1, random_state=seed).columns.tolist() == \
            p.sample(n=2, axis=1, random_state=seed).columns.tolist()


def test_replace_regex_kwarg_form():
    """Wave 60: replace(regex={pat: repl}) — patterns as the spec."""
    p = pd.DataFrame({"a": ["x1", "y2", "z3"], "b": [1, 2, 3]})
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal(
        m.replace(regex={r"[xyz]": "Q"}).to_pandas(),
        p.replace(regex={r"[xyz]": "Q"}), check_dtype=False)


def test_frame_agg_named_tuples():
    """Wave 60: df.agg(out=('col', 'fn')) named-tuple form."""
    p = pd.DataFrame({"v": [1.0, 3.0], "w": [2.0, 4.0]})
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal(
        m.agg(x=("v", "sum"), y=("w", "max")),
        p.agg(x=("v", "sum"), y=("w", "max")), check_dtype=False)


def test_resample_asfreq_fill_value():
    """Wave 61: resample().asfreq(fill_value=) fills boundary misses."""
    p = pd.DataFrame({
        "t": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 01:20"]),
        "v": [1.0, 3.0],
    }).set_index("t")
    m = mpd.DataFrame(p.reset_index()).set_index("t")
    pd.testing.assert_frame_equal(
        m.resample("30min").asfreq(fill_value=0.0).to_pandas(),
        p.resample("30min").asfreq(fill_value=0.0),
        check_dtype=False, check_freq=False)


def test_groupby_head_tail_negative():
    """Wave 63: head(-k)/tail(-k) = all but the last/first k per group."""
    p = pd.DataFrame({"g": ["a", "a", "a", "b", "b", "c"],
                      "v": [1, 2, 3, 4, 5, 6]})
    m = mpd.DataFrame(p)
    pd.testing.assert_frame_equal(m.groupby("g").head(-1).to_pandas(),
                                  p.groupby("g").head(-1), check_dtype=False)
    pd.testing.assert_frame_equal(m.groupby("g").tail(-1).to_pandas(),
                                  p.groupby("g").tail(-1), check_dtype=False)
    pd.testing.assert_frame_equal(m.groupby("g").head(2).to_pandas(),
                                  p.groupby("g").head(2), check_dtype=False)


def test_groupby_value_counts_sorts_within_groups():
    """Wave 63: value_counts sorts the count WITHIN each group; groups
    stay in key order (engine previously sorted globally)."""
    p = pd.DataFrame({"g": ["a", "a", "a", "b", "b", "c"],
                      "v": [1.0, 1.0, 3.0, 4.0, 5.0, 6.0]})
    m = mpd.DataFrame(p)
    eq_series(m.groupby("g").v.value_counts(), p.groupby("g").v.value_counts())
    eq_series(m.groupby("g").v.value_counts(normalize=True),
              p.groupby("g").v.value_counts(normalize=True))


def test_groupby_apply_series_names_columns():
    """Wave 63: aligned per-group Series results carry the series NAME as
    the result's columns-axis name."""
    p = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
    m = mpd.DataFrame(p)
    got = m.groupby("g").apply(lambda d: d.v.describe()[["count", "mean"]],
                               include_groups=False).to_pandas()
    want = p.groupby("g").apply(lambda d: d.v.describe()[["count", "mean"]],
                                include_groups=False)
    assert got.columns.name == want.columns.name == "v"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
