"""Joins & set ops: merge strategies, concat, dedup, asof."""

import numpy as np
import pandas as pd
import pytest

from tests.conftest import assert_df_equal

LEFT = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": list("abcde")})
RIGHT = pd.DataFrame({"k": [1, 2, 4], "rv": [10.0, 20.0, 40.0]})


@pytest.fixture()
def joins(spark):
    import modin_spark.pandas as mpd

    return mpd.from_pandas(LEFT), mpd.from_pandas(RIGHT)


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
def test_merge_hows(joins, how):
    ml, mr = joins
    got = ml.merge(mr, on="k", how=how).to_pandas()
    ref = pd.merge(LEFT, RIGHT, on="k", how=how)
    assert_df_equal(got, ref, sort_by=["k", "lv"] if how != "right" else ["k"])


def test_merge_left_right_on(joins):
    ml, mr = joins
    got = ml.merge(mr.rename(columns={"k": "rk"}), left_on="k", right_on="rk").to_pandas()
    ref = pd.merge(LEFT, RIGHT.rename(columns={"k": "rk"}), left_on="k", right_on="rk")
    assert_df_equal(got, ref, sort_by=["k", "lv"])


def test_self_merge_values(joins):
    ml, _ = joins
    got = ml.merge(ml, on="k").to_pandas()
    ref = pd.merge(LEFT, LEFT, on="k")
    assert_df_equal(got, ref, sort_by=["k", "lv_x", "lv_y"])


def test_merge_broadcast(joins):
    ml, mr = joins
    from modin_spark import plans

    j = ml.merge(mr, on="k", broadcast=True)
    assert plans.uses_broadcast_join(j._frame.sdf)
    assert_df_equal(j.to_pandas(), pd.merge(LEFT, RIGHT, on="k"), sort_by=["k", "lv"])


def test_join_on_index(joins):
    ml, mr = joins
    got = ml.set_index("k").join(mr.set_index("k")).reset_index().to_pandas()
    ref = LEFT.set_index("k").join(RIGHT.set_index("k")).reset_index()
    assert_df_equal(got, ref, sort_by=["k", "lv"])


def test_concat_rows(joins):
    ml, mr = joins
    import modin_spark.pandas as mpd

    got = mpd.concat([ml, ml]).to_pandas()
    ref = pd.concat([LEFT, LEFT], ignore_index=True)
    assert_df_equal(got, ref)


def test_concat_outer_missing_cols(spark):
    import modin_spark.pandas as mpd

    a = pd.DataFrame({"x": [1, 2], "y": [3.0, 4.0]})
    b = pd.DataFrame({"x": [5], "z": ["q"]})
    got = mpd.concat([mpd.from_pandas(a), mpd.from_pandas(b)]).to_pandas()
    ref = pd.concat([a, b], ignore_index=True)
    assert list(got.columns) == list(ref.columns)
    assert got["x"].tolist() == ref["x"].tolist()


def test_drop_duplicates(mdf, pdf):
    got = mdf.drop_duplicates(subset=["k"]).to_pandas()
    ref = pdf.drop_duplicates(subset=["k"])
    assert_df_equal(got, ref.reset_index(drop=True))
    got = mdf.drop_duplicates(subset=["k"], keep="last").to_pandas()
    ref = pdf.drop_duplicates(subset=["k"], keep="last")
    assert_df_equal(got, ref.reset_index(drop=True))


def test_duplicated(mdf, pdf):
    got = mdf.duplicated(subset=["k"]).to_pandas()
    ref = pdf.duplicated(subset=["k"])
    assert (got.values == ref.values).all()


def test_merge_asof(spark):
    import modin_spark.pandas as mpd

    t = pd.DataFrame({"ts": [1, 5, 10, 15], "tv": list("abcd")})
    q = pd.DataFrame({"ts": [0, 4, 11], "qv": [1.0, 2.0, 3.0]})
    got = mpd.merge_asof(mpd.from_pandas(t), mpd.from_pandas(q), on="ts").to_pandas()
    ref = pd.merge_asof(t, q, on="ts")
    assert_df_equal(got[["ts", "tv", "qv"]], ref, sort_by=["ts"])


def test_merge_asof_by(spark):
    import modin_spark.pandas as mpd

    t = pd.DataFrame({"g": ["a", "a", "b"], "ts": [5, 10, 5], "tv": [1, 2, 3]})
    q = pd.DataFrame({"g": ["a", "b"], "ts": [4, 6], "qv": [9.0, 8.0]})
    got = mpd.merge_asof(mpd.from_pandas(t.sort_values("ts")), mpd.from_pandas(q.sort_values("ts")), on="ts", by="g").to_pandas()
    ref = pd.merge_asof(t.sort_values("ts"), q.sort_values("ts"), on="ts", by="g")
    assert_df_equal(
        got[["g", "ts", "tv", "qv"]].sort_values(["g", "ts"]).reset_index(drop=True),
        ref[["g", "ts", "tv", "qv"]].sort_values(["g", "ts"]).reset_index(drop=True),
    )


def test_isin_semi(mdf, pdf):
    got = mdf[mdf.k.isin(["x", "y"])].to_pandas()
    ref = pdf[pdf.k.isin(["x", "y"])]
    assert_df_equal(got, ref.reset_index(drop=True))


def test_concat_post_merge_frame(joins):
    """pd.concat of a frame produced by merge: its ORDER_COL is an opaque
    struct — concat must flatten it to a position, not cast it to double."""
    ml, mr = joins
    import modin_spark.pandas as mpd

    merged = ml.merge(mr, on="k", how="inner")
    got = mpd.concat([merged, merged]).to_pandas()
    pref = LEFT.merge(RIGHT, on="k", how="inner")
    ref = pd.concat([pref, pref], ignore_index=True)
    assert len(got) == len(ref)
    assert sorted(got["lv"].tolist()) == sorted(ref["lv"].tolist())


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_merge_asof_directions(spark, direction, exact):
    import modin_spark.pandas as mpd

    rng = np.random.default_rng(3)
    t = pd.DataFrame({"ts": np.sort(rng.integers(0, 500, 120)), "tv": np.arange(120)})
    q = pd.DataFrame({"ts": np.sort(rng.integers(0, 500, 80)), "qv": rng.random(80)})
    got = mpd.merge_asof(
        mpd.from_pandas(t), mpd.from_pandas(q), on="ts",
        direction=direction, allow_exact_matches=exact,
    ).to_pandas()
    ref = pd.merge_asof(t, q, on="ts", direction=direction, allow_exact_matches=exact)
    g = got.sort_values(["ts", "tv"]).reset_index(drop=True)
    r = ref.sort_values(["ts", "tv"]).reset_index(drop=True)
    np.testing.assert_allclose(g["qv"].values, r["qv"].values, equal_nan=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_merge_asof_by_directions(spark, direction):
    import modin_spark.pandas as mpd

    rng = np.random.default_rng(4)
    t = pd.DataFrame({
        "g": rng.choice(list("xyz"), 90), "ts": np.sort(rng.integers(0, 300, 90)), "tv": np.arange(90)
    })
    q = pd.DataFrame({
        "g": rng.choice(list("xyz"), 60), "ts": np.sort(rng.integers(0, 300, 60)), "qv": rng.random(60)
    })
    got = mpd.merge_asof(
        mpd.from_pandas(t), mpd.from_pandas(q), on="ts", by="g", direction=direction
    ).to_pandas()
    ref = pd.merge_asof(t, q, on="ts", by="g", direction=direction)
    g = got.sort_values(["g", "ts", "tv"]).reset_index(drop=True)
    r = ref.sort_values(["g", "ts", "tv"]).reset_index(drop=True)
    np.testing.assert_allclose(g["qv"].values, r["qv"].values, equal_nan=True)


def test_merge_asof_tolerance_datetime(spark):
    import modin_spark.pandas as mpd

    t = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 05:00"]), "tv": [1, 2, 3]})
    q = pd.DataFrame({"ts": pd.to_datetime(["2023-12-31 23:30", "2024-01-01 00:55", "2024-01-01 02:00"]), "qv": [10.0, 20.0, 30.0]})
    got = mpd.merge_asof(
        mpd.from_pandas(t), mpd.from_pandas(q), on="ts", tolerance=pd.Timedelta("45min")
    ).to_pandas()
    ref = pd.merge_asof(t, q, on="ts", tolerance=pd.Timedelta("45min"))
    g = got.sort_values("ts").reset_index(drop=True)
    np.testing.assert_allclose(g["qv"].values, ref["qv"].values, equal_nan=True)


def test_merge_asof_duplicate_right_keys(spark):
    # among equal right keys the LAST right row (original order) must win
    import modin_spark.pandas as mpd

    t = pd.DataFrame({"ts": [5, 10], "tv": [1, 2]})
    q = pd.DataFrame({"ts": [5, 5, 5], "qv": [1.0, 2.0, 3.0]})
    got = mpd.merge_asof(mpd.from_pandas(t), mpd.from_pandas(q), on="ts").to_pandas()
    ref = pd.merge_asof(t, q, on="ts")
    g = got.sort_values("ts").reset_index(drop=True)
    np.testing.assert_allclose(g["qv"].values, ref["qv"].values)


def test_range_join_bucketized_matches_theta(spark):
    import modin_spark.pandas as mpd
    from modin_spark.operators.joins import range_join

    rng = np.random.default_rng(5)
    left = mpd.from_pandas(pd.DataFrame({"v": rng.random(300) * 100}))
    rr = pd.DataFrame({"lo": [0.0, 15.0, 40.0, 90.0], "hi": [20.0, 35.0, 80.0, 95.0], "tag": list("abcd")})
    right = mpd.from_pandas(rr)
    theta = range_join(left, right, "v", "lo", "hi").to_pandas()
    bucketed = range_join(left, right, "v", "lo", "hi", bucket_width=7.0).to_pandas()
    key = lambda d: sorted(zip(d["v"].round(9), d["tag"]))
    assert key(theta) == key(bucketed)


def test_merge_asof_left_on_right_on(spark):
    import modin_spark.pandas as mpd

    t = pd.DataFrame({"lt": [1, 5, 10, 15], "tv": list("abcd")})
    q = pd.DataFrame({"rt": [0, 4, 11], "qv": [1.0, 2.0, 3.0]})
    got = mpd.merge_asof(mpd.from_pandas(t), mpd.from_pandas(q), left_on="lt", right_on="rt").to_pandas()
    ref = pd.merge_asof(t, q, left_on="lt", right_on="rt")
    g = got.sort_values("lt").reset_index(drop=True)
    assert set(["lt", "tv", "rt", "qv"]) <= set(g.columns)
    np.testing.assert_allclose(g["qv"].values, ref["qv"].values, equal_nan=True)
    np.testing.assert_allclose(g["rt"].values.astype(float), ref["rt"].values.astype(float), equal_nan=True)


def test_merge_indicator(joins):
    ml, mr = joins
    got = ml.merge(mr, on="k", how="outer", indicator=True).to_pandas()
    ref = LEFT.merge(RIGHT, on="k", how="outer", indicator=True)
    g = got.groupby("_merge").size().to_dict()
    r = ref.groupby("_merge", observed=True).size().to_dict()
    assert {k: v for k, v in g.items() if v} == {str(k): v for k, v in r.items() if v}
