"""Round-11 fixes: the five round-10 ADVICE defects plus the verdict's
"What's wrong" list. Every case diverged from real pandas (or was a silent
data-loss path) before the fix."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def eq_frame(got, want, reset=True):
    if reset:
        got, want = got.reset_index(drop=True), want.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_index_type=False)


# ------------------------------------------------------------- ADVICE r10

def test_groupby_callable_agg_fractional_group_not_truncated():
    # ADVICE medium: a callable returning int on the sampled group but a
    # fractional float elsewhere must not be silently int-truncated
    p = pd.DataFrame({"k": ["a", "a", "b", "b"], "v": [2, 2, 3, 4]})
    m = mpd.from_pandas(p)

    def f(s):
        return s.mean()

    rp = p.groupby("k").agg(m=("v", f)).reset_index()
    rm = m.groupby("k").agg(m=("v", f)).reset_index().to_pandas()
    rm = rm.sort_values("k").reset_index(drop=True)
    rp = rp.sort_values("k").reset_index(drop=True)
    np.testing.assert_allclose(rm["m"].astype(float), rp["m"].astype(float))
    assert rm["m"].dtype.kind == "f"


def test_groupby_callable_agg_all_integral_stays_int():
    p = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 3, 5]})
    m = mpd.from_pandas(p)
    rp = p.groupby("k").agg(m=("v", lambda s: s.max())).reset_index()
    rm = m.groupby("k").agg(m=("v", lambda s: s.max())).reset_index().to_pandas()
    assert rm["m"].dtype.kind in "il"
    assert sorted(rm["m"]) == sorted(rp["m"])


def test_iloc_setitem_list_values_per_row():
    # ADVICE low: pandas assigns list values elementwise
    p = pd.DataFrame({"a": [1, 2, 3, 4], "b": [5, 6, 7, 8]})
    m = mpd.from_pandas(p)
    p.iloc[[0, 1], 0] = [10, 20]
    m.iloc[[0, 1], 0] = [10, 20]
    eq_frame(m.to_pandas(), p)


def test_iloc_setitem_2d_values():
    p = pd.DataFrame({"a": [1, 2, 3], "b": [4, 5, 6]})
    m = mpd.from_pandas(p)
    p.iloc[[0, 2], [0, 1]] = [[10, 40], [30, 60]]
    m.iloc[[0, 2], [0, 1]] = [[10, 40], [30, 60]]
    eq_frame(m.to_pandas(), p)


def test_iloc_setitem_per_column_broadcast():
    p = pd.DataFrame({"a": [1, 2, 3], "b": [4, 5, 6]})
    m = mpd.from_pandas(p)
    p.iloc[[0, 1], [0, 1]] = [100, 200]
    m.iloc[[0, 1], [0, 1]] = [100, 200]
    eq_frame(m.to_pandas(), p)


def test_iloc_setitem_shape_mismatch_raises():
    m = mpd.from_pandas(pd.DataFrame({"a": [1, 2, 3]}))
    with pytest.raises(ValueError):
        m.iloc[[0, 1], 0] = [1, 2, 3]


def test_native_max_rows_zero_disables_empty_frames(monkeypatch):
    # ADVICE low: MAX_ROWS=0 must be a hard off switch even for len-0 frames
    monkeypatch.setenv("MODIN_SPARK_NATIVE_MAX_ROWS", "0")
    m = mpd.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64")}))
    assert m._frame.native_pdf is None


def test_reset_index_level0_when_index_column_exists():
    # ADVICE low: pandas names the new column level_0 when "index" is taken
    p = pd.DataFrame({"index": [10, 20, 30], "v": [1, 2, 3]})
    m = mpd.from_pandas(p)
    rp = p.reset_index()
    rm = m.reset_index().to_pandas()
    assert list(rm.columns) == list(rp.columns) == ["level_0", "index", "v"]
    eq_frame(rm, rp)
    # named-index path unaffected
    p2 = p.set_index("v")
    m2 = mpd.from_pandas(p2)
    assert list(m2.reset_index().to_pandas().columns) == list(p2.reset_index().columns)


def test_series_unique_docstring_visible():
    # VERDICT wrong #3: the order-contract note must render in help()
    doc = mpd.Series.unique.__doc__
    assert doc and "FIRST-APPEARANCE" in doc


def test_read_csv_skiprows_stays_jvm_side(tmp_path):
    # VERDICT wrong #1: the skiprows route must not serialize lines through
    # Python workers — the kept text feeds the Scala csv(Dataset[String])
    # overload, so no Python stage may appear in the plan or RDD lineage
    p = tmp_path / "sk.csv"
    p.write_text("garbage\njunk junk\na,b,c\n1,2,x\n3,4,y\n")
    got = mpd.read_csv(str(p), skiprows=2)
    want = pd.read_csv(str(p), skiprows=2)
    eq_frame(got.to_pandas(), want)
    jqe = got._frame.sdf._jdf.queryExecution()
    assert "python" not in jqe.toString().lower()
    assert "python" not in str(jqe.toRdd().toDebugString()).lower()


def test_label_keyed_mutation_after_sort_matches_pandas():
    # VERDICT wrong #4 ("wave-19 item 2 ghost"): drop(index=) / reindex /
    # loc assignment keyed on LABELS after sort_values on a filtered frame
    # must use the true pandas labels, not fresh positions
    p = pd.DataFrame({"a": [5, 3, 9, 1, 7, 2], "b": list("uvwxyz")})
    p = p[p.a > 1]                      # filtered: labels gap (0,1,2,4,5)
    m = mpd.from_pandas(p)

    ps = p.sort_values("a")
    ms = m.sort_values("a")

    # drop by label after sort
    eq_frame(ms.drop(index=[0, 4]).to_pandas().reset_index(drop=True),
             ps.drop(index=[0, 4]).reset_index(drop=True))
    # reindex by label after sort
    eq_frame(ms.reindex([5, 2, 0]).to_pandas().reset_index(drop=True),
             ps.reindex([5, 2, 0]).reset_index(drop=True))
    # loc read by label after sort
    assert ms.loc[4, "b"] == ps.loc[4, "b"]
    # loc assignment by label after sort
    ps2 = ps.copy()
    ps2.loc[2, "b"] = "Q"
    ms2 = m.sort_values("a")
    ms2.loc[2, "b"] = "Q"
    eq_frame(ms2.to_pandas().reset_index(drop=True), ps2.reset_index(drop=True))


def test_frame_value_counts_single_column_multiindex_shape():
    # VERDICT wrong #2: pandas wraps even a 1-column subset in a 1-level
    # MultiIndex — downstream .loc[("x",)] tuples rely on it
    p = pd.DataFrame({"k": list("xxyz"), "v": [1, 1, 2, 3]})
    m = mpd.from_pandas(p)
    rp = p.value_counts(subset=["k"])
    rm = m.value_counts(subset=["k"]).to_pandas()
    assert isinstance(rm.index, pd.MultiIndex) and rm.index.nlevels == 1
    assert rm.index.names == rp.index.names
    assert rm.loc[("x",)] == rp.loc[("x",)] == 2
    pd.testing.assert_series_equal(rm, rp, check_dtype=False)
    # multi-column subset unchanged
    rp2 = p.value_counts()
    rm2 = m.value_counts().to_pandas()
    assert rm2.index.nlevels == 2
    pd.testing.assert_series_equal(rm2, rp2, check_dtype=False)


def test_to_datetime_dayfirst():
    # wave 33 quickie: dayfirst resolves the ambiguous d/m order
    got = mpd.to_datetime(
        mpd.from_pandas(pd.DataFrame({"x": ["02/03/2024", "15/01/2024"]})).x,
        dayfirst=True).astype(str).to_pandas().tolist()
    want = pd.to_datetime(pd.Series(["02/03/2024", "15/01/2024"]),
                          dayfirst=True).astype(str).tolist()
    assert got == want
