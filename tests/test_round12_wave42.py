"""Probe wave 42 (round 12): binary operands with differing row sets
outer-align like pandas (the rebase fast path now requires lineage-id
equality), explode/repeat keep original positional labels, merge indicator
Categorical, timedelta dt.components, reindex_like rows, align join=
left/right row padding."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def _eqs(got, exp):
    pd.testing.assert_series_equal(got.to_pandas(), exp, check_dtype=False,
                                   check_index_type=False, check_freq=False)


def _eqf(got, exp):
    pd.testing.assert_frame_equal(got.to_pandas(), exp, check_dtype=False,
                                  check_index_type=False, check_column_type=False,
                                  check_freq=False)


def _pair():
    d = {"a": [1.0, 2.0, 3.0, 4.0], "b": [5.0, 6.0, 7.0, 8.0]}
    return pd.DataFrame(d), mpd.DataFrame(d)


def test_subset_binary_outer_aligns():
    P, M = _pair()
    _eqs(M["a"] + M["a"].iloc[1:], P["a"] + P["a"].iloc[1:])
    _eqs(M["a"].iloc[1:] + M["a"], P["a"].iloc[1:] + P["a"])
    _eqs(M["a"].iloc[:3] + M["a"].iloc[1:], P["a"].iloc[:3] + P["a"].iloc[1:])


def test_flex_fill_value_subset():
    P, M = _pair()
    _eqs(M["a"].add(M["a"].iloc[1:], fill_value=100),
         P["a"].add(P["a"].iloc[1:], fill_value=100))
    _eqf(M[["a"]].add(P[["a"]].iloc[1:], fill_value=0),
         P[["a"]].add(P[["a"]].iloc[1:], fill_value=0))


def test_sorted_operand_binary_sorts_union():
    P, M = _pair()
    _eqs(M.sort_values("a", ascending=False)["a"] + M["b"],
         P.sort_values("a", ascending=False)["a"] + P["b"])
    # same-frame fast path still holds (sorted frame with itself)
    sm, sp = M.sort_values("a", ascending=False), P.sort_values("a", ascending=False)
    _eqs(sm["a"] + sm["b"], sp["a"] + sp["b"])


def test_explode_repeat_keep_labels():
    P = pd.Series([[1, 2], [3], [4, 5]])
    M = mpd.Series([[1, 2], [3], [4, 5]])
    _eqs(M.explode(), P.explode())
    _eqs(mpd.Series(["x", "y"]).repeat(2), pd.Series(["x", "y"]).repeat(2))
    Pf = pd.DataFrame({"l": [[1, 2], [3]], "g": ["a", "b"]})
    Mf = mpd.DataFrame({"l": [[1, 2], [3]], "g": ["a", "b"]})
    _eqf(Mf.explode("l"), Pf.explode("l"))
    _eqf(Mf.explode("l", ignore_index=True), Pf.explode("l", ignore_index=True))


def test_frame_binary_label_alignment():
    P1 = pd.DataFrame({"a": [1.0, 2.0, 3.0]}, index=["x", "y", "z"])
    P2 = pd.DataFrame({"a": [10.0, 20.0], "b": [1, 2]}, index=["y", "w"])
    M1 = mpd.DataFrame({"a": [1.0, 2.0, 3.0]}, index=["x", "y", "z"])
    M2 = mpd.DataFrame({"a": [10.0, 20.0], "b": [1, 2]}, index=["y", "w"])
    _eqf(M1 + M2, P1 + P2)
    _eqf(M1.add(M2, fill_value=0), P1.add(P2, fill_value=0))
    _eqf(M1 + P2, P1 + P2)  # raw pandas operand
    # reordered operand: pandas sorts the label union
    _eqf(M1.sort_index(ascending=False) + M1, P1.iloc[::-1] + P1)
    # default-index subsets keep gap labels
    Pd, Md = _pair()
    _eqf(Md + Md.iloc[1:], Pd + Pd.iloc[1:])
    _eqf(Md.iloc[:1] + Md.iloc[3:], Pd.iloc[:1] + Pd.iloc[3:])


def test_merge_indicator_categorical():
    P, M = _pair()
    P2, M2 = P.assign(g=["x", "y", "x", "y"]), M.assign(g=["x", "y", "x", "y"])
    exp = P2[["g", "a"]].merge(P2[["g", "b"]].iloc[:2], on="g", how="left", indicator=True)
    got = M2[["g", "a"]].merge(M2[["g", "b"]].iloc[:2], on="g", how="left", indicator=True)
    _eqf(got, exp)
    assert isinstance(got.to_pandas()["_merge"].dtype, pd.CategoricalDtype)


def test_timedelta_components():
    td = pd.to_timedelta(["1D 2h 3min 4s 567ms", "3h", None, "90s"])
    P = pd.DataFrame({"td": td})
    M = mpd.DataFrame({"td": td})
    _eqf(M["td"].dt.components, P["td"].dt.components)


def test_where_mask_misaligned_other():
    P, M = _pair()
    _eqs(M["a"].where(M["a"] > 2, M["a"].iloc[1:] * -1),
         P["a"].where(P["a"] > 2, P["a"].iloc[1:] * -1))
    _eqs(M["a"].mask(M["a"] > 2, M["a"].iloc[1:] * -1),
         P["a"].mask(P["a"] > 2, P["a"].iloc[1:] * -1))
    _eqs(M["a"].where(M["a"] > 2, M["b"]), P["a"].where(P["a"] > 2, P["b"]))


def test_update_and_combine_first_label_alignment():
    P = pd.DataFrame({"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, 3.0, 4.0]})
    M = mpd.DataFrame({"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, 3.0, 4.0]})
    pc = P.copy(); pc.update(P[["a"]].iloc[1:] * 10)
    mc = M.copy(); mc.update(M[["a"]].iloc[1:] * 10)
    _eqf(mc, pc)
    _eqf(M[["a"]].iloc[1:].combine_first(M[["a"]]),
         P[["a"]].iloc[1:].combine_first(P[["a"]]))


def test_interpolate_method_index():
    Pi = pd.DataFrame({"a": [1.0, np.nan, np.nan, 4.0]})
    Mi = mpd.DataFrame({"a": [1.0, np.nan, np.nan, 4.0]})
    _eqf(Mi.interpolate(method="index"), Pi.interpolate(method="index"))
    # gappy default labels: the abscissa keeps the gaps
    _eqf(Mi.iloc[[0, 2, 3]].interpolate(method="index"),
         Pi[Pi.index != 1].interpolate(method="index"))


def test_read_csv_multiindex_header(tmp_path):
    p = str(tmp_path / "mi.csv")
    pd.DataFrame(np.arange(8).reshape(2, 4),
                 columns=pd.MultiIndex.from_product([["A", "B"], ["x", "y"]])
                 ).to_csv(p, index=False)
    _eqf(mpd.read_csv(p, header=[0, 1]), pd.read_csv(p, header=[0, 1]))


def test_from_dict_orient_index_and_array():
    _eqf(mpd.DataFrame.from_dict({"r1": [1, 2], "r2": [3, 4]}, orient="index",
                                 columns=["a", "b"]),
         pd.DataFrame.from_dict({"r1": [1, 2], "r2": [3, 4]}, orient="index",
                                columns=["a", "b"]))
    P, M = _pair()
    assert np.asarray(M).tolist() == np.asarray(P).tolist()


def test_sample_weights_and_convert_dtypes():
    s = mpd.Series([3.0, 1.0, 2.0, 1.0])
    r = s.sample(1, weights=[0, 0, 1, 0], random_state=0).to_pandas()
    assert r.tolist() == [2.0] and r.index.tolist() == [2]
    df = mpd.DataFrame({"a": [1.0, 2.0, 3.0]})
    assert df.sample(1, weights=[1, 0, 0], random_state=0).to_pandas().a.tolist() == [1.0]
    mixed = pd.DataFrame({"a": [1, 2], "s": ["x", "y"], "f": [1.5, 2.5]})
    assert (mpd.DataFrame(mixed).convert_dtypes().dtypes.astype(str).tolist()
            == mixed.convert_dtypes().dtypes.astype(str).tolist())


def test_reindex_like_and_align_rows():
    P, M = _pair()
    _eqf(M[["a"]].iloc[:2].reindex_like(P[["a"]]), P[["a"]].iloc[:2].reindex_like(P[["a"]]))
    for join in ("left", "right"):
        e0, e1 = P[["a"]].align(P[["b"]].iloc[1:], join=join)
        g0, g1 = M[["a"]].align(M[["b"]].iloc[1:], join=join)
        _eqf(g0, e0)
        _eqf(g1, e1)


def test_merge_descendant_subset_binary():
    """Binaries between a merge output and its own row-subset pair by ROW
    IDENTITY (shared order epoch), matching pandas label alignment."""
    L = pd.DataFrame({"g": [1.0, 2.0, 3.0], "a": [1.0, 2.0, 3.0]})
    D = pd.DataFrame({"g": [1.0, 2.0, 3.0], "lab": ["A", "B", "C"]})
    Pm = L.merge(D, on="g", how="left")
    Mm = mpd.DataFrame(L).merge(mpd.DataFrame(D), on="g", how="left")
    exp = Pm.copy(); exp["a2"] = Pm.a + Pm[Pm.a > 1.5].a
    got = Mm.copy(); got["a2"] = Mm.a + Mm[Mm.a > 1.5].a
    pd.testing.assert_frame_equal(
        got.to_pandas().sort_values("g").reset_index(drop=True),
        exp.sort_values("g").reset_index(drop=True),
        check_dtype=False, check_index_type=False)


def test_sorted_frame_cross_setitem_keeps_labels():
    P = pd.DataFrame({"a": [3.0, 1.0, 2.0, 4.0]})
    Ps = P.sort_values("a").head(3)
    Ms = mpd.DataFrame(P).sort_values("a").head(3)
    exp = Ps.copy(); exp["a2"] = Ps.a + Ps[Ps.a > 1.5].a
    got = Ms.copy(); got["a2"] = Ms.a + Ms[Ms.a > 1.5].a
    pd.testing.assert_frame_equal(got.to_pandas(), exp, check_dtype=False,
                                  check_index_type=False)
    # mixed-lineage label-aligned setitem onto the permuted-label frame
    exp2 = Ps.copy(); exp2["z"] = pd.Series([10.0, 20, 30, 40])
    got2 = Ms.copy(); got2["z"] = mpd.Series(pd.Series([10.0, 20, 30, 40]))
    pd.testing.assert_frame_equal(got2.to_pandas(), exp2, check_dtype=False,
                                  check_index_type=False)


def test_agg_descendant_subset_binary():
    """Binaries between a groupby-agg output and its own row-subset also
    align by row identity (the constructor-default order epoch)."""
    P = pd.DataFrame({"g": [0.0, 1.0, 2.0, 1.0], "a": [-2.0, 1.0, 16.0, 1.25]})
    M = mpd.DataFrame(P)
    Pg = P.groupby("g").agg({"a": "sum"}).reset_index()
    Mg = M.groupby("g").agg({"a": "sum"}).reset_index()
    exp = Pg.copy(); exp["a2"] = Pg.a + Pg[Pg.a > 0].a
    got = Mg.copy(); got["a2"] = Mg.a + Mg[Mg.a > 0].a
    pd.testing.assert_frame_equal(
        got.to_pandas().sort_values("g").reset_index(drop=True),
        exp.sort_values("g").reset_index(drop=True),
        check_dtype=False, check_index_type=False)
