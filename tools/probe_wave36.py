"""Probe wave 36: remaining unswept surface from probe_wave33_candidates.md —
groupby.resample kwargs, update(filter_func=), Styler render, read_csv
engine kwargs, plus constructor-adjacent edges surfaced by the r12 sweep.

Usage: python tools/probe_wave36.py   (prints PASS/DIFF per probe)
"""
import os
import sys
import traceback
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")

import numpy as np
import pandas as pd

import modin_spark.pandas as mpd

RESULTS = []


def probe(name):
    def deco(fn):
        try:
            exp = fn(pd)
        except Exception as e:
            exp = f"RAISE:{type(e).__name__}"
        try:
            got = fn(mpd)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
        except Exception as e:
            got = f"RAISE:{type(e).__name__}"
            if not isinstance(exp, str):
                traceback.print_exc(limit=3)
        ok = False
        try:
            if isinstance(exp, str) or isinstance(got, str):
                ok = isinstance(exp, str) and isinstance(got, str) and exp == got
            elif isinstance(exp, pd.DataFrame):
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_index_type=False,
                    check_column_type=False, check_categorical=False, check_freq=False)
                ok = True
            elif isinstance(exp, pd.Series):
                pd.testing.assert_series_equal(
                    got, exp, check_dtype=False, check_index_type=False,
                    check_categorical=False, check_freq=False)
                ok = True
            else:
                try:
                    ok = bool(exp == got) or bool(pd.isna(exp) and pd.isna(got))
                except (ValueError, TypeError):
                    ok = False
        except (AssertionError, ValueError, TypeError):
            ok = False
        RESULTS.append((name, ok))
        status = "PASS" if ok else "DIFF"
        print(f"{status} {name}")
        if not ok:
            print(f"  exp: {str(exp)[:200]}")
            print(f"  got: {str(got)[:200]}")
        return fn
    return deco


EV = pd.DataFrame({
    "g": ["a", "a", "b", "b", "a", "b"],
    "t": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 01:20", "2024-01-01 00:40",
                         "2024-01-01 02:05", "2024-01-01 02:30", "2024-01-01 02:55"]),
    "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
})


@probe("groupby_resample_sum")
def _(l):
    d = l.DataFrame(EV)
    return d.groupby("g").resample("1h", on="t")["v"].sum()


@probe("groupby_resample_origin")
def _(l):
    d = l.DataFrame(EV)
    return d.groupby("g").resample("90min", on="t", origin="epoch")["v"].sum()


@probe("update_filter_func")
def _(l):
    d = l.DataFrame({"a": [1.0, 2.0, 3.0]})
    o = l.DataFrame({"a": [9.0, 9.0, 9.0]})
    d.update(o, filter_func=lambda x: x > 1.5)
    return d


@probe("update_errors_raise")
def _(l):
    d = l.DataFrame({"a": [1.0, np.nan]})
    o = l.DataFrame({"a": [9.0, 8.0]})
    d.update(o, errors="raise")
    return d


@probe("styler_render_smoke")
def _(l):
    d = l.DataFrame({"a": [1, 2]})
    html = d.style.to_html()
    return "table" in html


@probe("read_csv_pyarrow_engine")
def _(l):
    import tempfile
    p = os.path.join(tempfile.gettempdir(), "probe36.csv")
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_csv(p, index=False)
    return l.read_csv(p, engine="pyarrow")


@probe("read_csv_dtype_backend")
def _(l):
    import tempfile
    p = os.path.join(tempfile.gettempdir(), "probe36b.csv")
    pd.DataFrame({"a": [1, None], "b": ["x", "y"]}).to_csv(p, index=False)
    out = l.read_csv(p, dtype_backend="numpy_nullable")
    return str(out.dtypes["a"])


@probe("rolling_win_type_unsupported_raises")
def _(l):
    s = l.Series([1.0, 2.0, 3.0, 4.0])
    try:
        return s.rolling(2, win_type="exponential").mean().iloc[1]
    except Exception as e:
        return f"RAISE:{type(e).__name__}"


@probe("series_scalar_no_index")
def _(l):
    return l.Series(5.0, index=["a", "b"]) + 1


@probe("dataframe_list_of_dicts")
def _(l):
    return l.DataFrame([{"a": 1, "b": 2}, {"a": 3}])


@probe("series_empty_no_args")
def _(l):
    return len(l.Series(dtype="float64"))


@probe("df_from_2d_ndarray")
def _(l):
    return l.DataFrame(np.arange(6).reshape(2, 3), columns=list("xyz"))


@probe("series_bool_any_all_empty")
def _(l):
    s = l.Series([], dtype=bool)
    return (bool(s.any()), bool(s.all()))


@probe("groupby_agg_on_ext_dtype")
def _(l):
    d = l.DataFrame({"k": ["a", "a", "b"],
                     "v": pd.array([1, None, 3], dtype="Int64")})
    return d.groupby("k")["v"].sum()


@probe("ext_dtype_arithmetic_keeps_na")
def _(l):
    s = l.Series(pd.array([1, None, 3], dtype="Int64"))
    return s + 1


@probe("qcut_retbins")
def _(l):
    r, bins = l.qcut(l.Series([1, 2, 3, 4]), 2, retbins=True)
    return list(np.round(bins, 3))


@probe("cut_right_false_labels")
def _(l):
    return [str(x) for x in (l.cut(l.Series([1, 5, 9]), 3, right=False).to_pandas()
                             if l is mpd else l.cut(l.Series([1, 5, 9]), 3, right=False))]


@probe("crosstab_normalize")
def _(l):
    return l.crosstab(l.Series(["x", "x", "y"], name="r"),
                      l.Series([1, 2, 1], name="c"), normalize="all")


@probe("merge_on_ext_dtype_key")
def _(l):
    a = l.DataFrame({"k": pd.array([1, 2], dtype="Int64"), "x": [1.0, 2.0]})
    b = l.DataFrame({"k": pd.array([2, 3], dtype="Int64"), "y": [5.0, 6.0]})
    return a.merge(b, on="k").sort_values("k").reset_index(drop=True)


n_ok = 0
if __name__ == "__main__":
    n_ok = sum(1 for _, ok in RESULTS if ok)
    print(f"\n{n_ok}/{len(RESULTS)} probes pass")
