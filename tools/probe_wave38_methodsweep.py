"""Probe wave 38: exhaustive METHOD sweep — every public Series/DataFrame
method invoked with canned arguments on a standard fixture, result diffed
against pandas (the systematic version of the per-wave hand-written probes;
the r12 constructor sweep proved presence testing is blind).

Methods that raise the SAME exception type on both sides count as parity.
Usage: python tools/probe_wave38_methodsweep.py [--verbose]
"""
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")

import numpy as np
import pandas as pd

import modin_spark.pandas as mpd

VERBOSE = "--verbose" in sys.argv

SER_DATA = dict(data=[2.0, 1.0, np.nan, 4.0], index=["a", "b", "c", "d"], name="v")
DF_DATA = dict(data={"g": ["x", "y", "x", "y"], "a": [1.0, 2.0, np.nan, 4.0],
                     "b": [10, 20, 30, 40], "s": ["p", "q", "r", "s"]})

# method -> (args, kwargs); None -> skip (side effects / needs resources)
SER_ARGS = {
    "abs": ((), {}), "add": (([1.0, 1.0, 1.0, 1.0],), {}), "add_prefix": (("p_",), {}),
    "add_suffix": (("_s",), {}), "agg": (("sum",), {}), "aggregate": (("sum",), {}),
    "align": None, "all": ((), {}), "any": ((), {}), "apply": ((lambda x: x * 2,), {}),
    "argmax": ((), {}), "argmin": ((), {}), "argsort": ((), {}),
    "asfreq": None, "asof": None,  # pandas DateParseError quirk on str key "astype": (("float64",), {}),
    "at_time": None, "autocorr": None, "backfill": ((), {}), "between": ((1, 3), {}),
    "between_time": None, "bfill": ((), {}), "bool": None, "clip": ((1.5, 3.5), {}),
    "combine": None, "combine_first": None, "compare": None, "convert_dtypes": ((), {}),
    "copy": ((), {}), "corr": None, "count": ((), {}), "cov": None,
    "cummax": ((), {}), "cummin": ((), {}), "cumprod": ((), {}), "cumsum": ((), {}),
    "describe": ((), {}), "diff": ((), {}), "div": ((2,), {}), "divide": ((2,), {}),
    "divmod": None, "dot": None, "drop": ((["a"],), {}), "drop_duplicates": ((), {}),
    "droplevel": None, "dropna": ((), {}), "duplicated": ((), {}),
    "eq": ((2.0,), {}), "equals": None, "ewm": None, "expanding": None,
    "explode": ((), {}), "factorize": None, "ffill": ((), {}),
    "fillna": ((0.0,), {}), "filter": ((), {"items": ["a", "b"]}),
    "first": None, "first_valid_index": ((), {}), "floordiv": ((2,), {}),
    "ge": ((2.0,), {}), "get": (("a",), {}), "groupby": None, "gt": ((2.0,), {}),
    "head": ((2,), {}), "hist": None, "idxmax": ((), {}), "idxmin": ((), {}),
    "infer_objects": ((), {}), "info": None, "interpolate": ((), {}),
    "isin": (([1.0, 2.0],), {}), "isna": ((), {}), "isnull": ((), {}),
    "item": None, "items": None, "keys": None, "kurt": ((), {}), "kurtosis": ((), {}),
    "last": None, "last_valid_index": ((), {}), "le": ((2.0,), {}),
    "lt": ((2.0,), {}), "map": ((lambda x: x + 1,), {}), "mask": None,
    "max": ((), {}), "mean": ((), {}), "median": ((), {}), "memory_usage": None,
    "min": ((), {}), "mod": ((2,), {}), "mode": ((), {}), "mul": ((2,), {}),
    "multiply": ((2,), {}), "ne": ((2.0,), {}), "nlargest": ((2,), {}),
    "notna": ((), {}), "notnull": ((), {}), "nsmallest": ((2,), {}),
    "nunique": ((), {}), "pad": ((), {}), "pct_change": ((), {}),
    "pipe": ((lambda s: s.sum(),), {}), "pop": None, "pow": ((2,), {}),
    "prod": ((), {}), "product": ((), {}), "quantile": ((0.5,), {}),
    "radd": ((1,), {}), "rank": ((), {}), "ravel": None, "rdiv": ((2,), {}),
    "rdivmod": None, "reindex": ((["a", "b", "z"],), {}),
    "reindex_like": None, "rename": (("w",), {}), "rename_axis": None,
    "reorder_levels": None, "repeat": ((2,), {}), "replace": ((1.0, 9.0), {}),
    "resample": None, "reset_index": ((), {}), "rfloordiv": ((2,), {}),
    "rmod": ((2,), {}), "rmul": ((2,), {}), "rolling": None, "round": ((0,), {}),
    "rpow": None, "rsub": ((2,), {}), "rtruediv": ((2,), {}), "sample": None,
    "searchsorted": None, "sem": ((), {}), "set_axis": ((["p", "q", "r", "s"],), {}),
    "set_flags": None, "shift": ((1,), {}), "skew": ((), {}),
    "sort_index": ((), {}), "sort_values": ((), {}), "squeeze": ((), {}),
    "std": ((), {}), "sub": ((1,), {}), "subtract": ((1,), {}), "sum": ((), {}),
    "swapaxes": None, "swaplevel": None, "tail": ((2,), {}), "take": (([0, 2],), {}),
    "to_clipboard": None, "to_csv": None, "to_dict": ((), {}), "to_excel": None,
    "to_frame": ((), {}), "to_hdf": None, "to_json": None, "to_latex": None,
    "to_list": ((), {}), "to_markdown": None, "to_numpy": ((), {}),
    "to_period": None, "to_pickle": None, "to_sql": None, "to_string": None,
    "to_timestamp": None, "to_xarray": None, "tolist": ((), {}),
    "transform": ((lambda x: x * 2,), {}), "transpose": ((), {}),
    "truediv": ((2,), {}), "truncate": None, "tz_convert": None,
    "tz_localize": None, "unique": ((), {}), "unstack": None, "update": None,
    "value_counts": ((), {}), "var": ((), {}), "view": None, "where": None,
    "xs": None,
}

DF_ARGS = {
    "abs": None, "add": None, "add_prefix": (("p_",), {}), "add_suffix": (("_s",), {}),
    "agg": (({"a": "sum", "b": "mean"},), {}), "aggregate": (({"a": "sum"},), {}),
    "align": None, "all": None, "any": None, "apply": None, "applymap": None,
    "asfreq": None, "asof": None, "assign": ((), {"c": lambda d: d["b"] * 2}),
    "astype": (({"b": "float64"},), {}), "at_time": None, "backfill": ((), {}),
    "between_time": None, "bfill": ((), {}), "bool": None, "boxplot": None,
    "clip": None, "combine": None, "combine_first": None, "compare": None,
    "convert_dtypes": ((), {}), "copy": ((), {}), "corr": ((), {"numeric_only": True}),
    "corrwith": None, "count": ((), {}), "cov": ((), {"numeric_only": True}),
    "cummax": ((), {"numeric_only": True}), "cummin": ((), {"numeric_only": True}),
    "cumprod": ((), {"numeric_only": True}), "cumsum": ((), {"numeric_only": True}),
    "describe": ((), {}), "diff": None, "div": None, "divide": None, "dot": None,
    "drop": ((), {"columns": ["s"]}), "drop_duplicates": ((), {"subset": ["g"]}),
    "droplevel": None, "dropna": ((), {}), "duplicated": ((), {"subset": ["g"]}),
    "eq": None, "equals": None, "eval": (("c = a + b",), {}), "ewm": None,
    "expanding": None, "explode": None, "ffill": ((), {}), "fillna": ((0.0,), {}),
    "filter": ((), {"items": ["a", "b"]}), "first": None,
    "first_valid_index": ((), {}), "floordiv": None, "ge": None, "get": (("a",), {}),
    "groupby": None, "gt": None, "head": ((2,), {}), "hist": None,
    "idxmax": ((), {"numeric_only": True}), "idxmin": ((), {"numeric_only": True}),
    "infer_objects": ((), {}), "info": None, "insert": None, "interpolate": ((), {}),
    "isetitem": None, "isin": (([1.0, 10],), {}), "isna": ((), {}), "isnull": ((), {}),
    "items": None, "iterrows": None, "itertuples": None, "join": None,
    "keys": None, "kurt": ((), {"numeric_only": True}),
    "kurtosis": ((), {"numeric_only": True}), "last": None,
    "last_valid_index": ((), {}), "le": None, "lt": None, "map": None, "mask": None,
    "max": ((), {"numeric_only": True}), "mean": ((), {"numeric_only": True}),
    "median": ((), {"numeric_only": True}), "melt": ((), {"id_vars": ["g"], "value_vars": ["a"]}),
    "memory_usage": None, "merge": None, "min": ((), {"numeric_only": True}),
    "mod": None, "mode": ((), {"numeric_only": True}), "mul": None, "multiply": None,
    "ne": None, "nlargest": ((2, "b"), {}), "notna": ((), {}), "notnull": ((), {}),
    "nsmallest": ((2, "b"), {}), "nunique": ((), {}), "pad": ((), {}),
    "pct_change": None, "pipe": ((lambda d: d.shape,), {}), "pivot": None,
    "pivot_table": ((), {"index": "g", "values": "a", "aggfunc": "mean"}),
    "pop": None, "pow": None, "prod": ((), {"numeric_only": True}),
    "product": ((), {"numeric_only": True}), "quantile": ((0.5,), {"numeric_only": True}),
    "query": (("b > 15",), {}), "radd": None, "rank": ((), {"numeric_only": True}),
    "rdiv": None, "reindex": None, "reindex_like": None,
    "rename": ((), {"columns": {"a": "A"}}), "rename_axis": None,
    "reorder_levels": None, "replace": ((1.0, 9.0), {}), "resample": None,
    "reset_index": ((), {}), "rfloordiv": None, "rmod": None, "rmul": None,
    "rolling": None, "round": ((1,), {}), "rpow": None, "rsub": None,
    "rtruediv": None, "sample": None, "select_dtypes": ((), {"include": "number"}),
    "sem": ((), {"numeric_only": True}), "set_axis": None, "set_flags": None,
    "set_index": (("g",), {}), "shift": ((1,), {}), "skew": ((), {"numeric_only": True}),
    "sort_index": ((), {}), "sort_values": (("b",), {}), "squeeze": None,
    "stack": None, "std": ((), {"numeric_only": True}), "sub": None,
    "subtract": None, "sum": ((), {"numeric_only": True}), "swapaxes": None,
    "swaplevel": None, "tail": ((2,), {}), "take": (([0, 2],), {}),
    "to_clipboard": None, "to_csv": None, "to_dict": ((), {}), "to_excel": None,
    "to_feather": None, "to_gbq": None, "to_hdf": None, "to_html": None,
    "to_json": None, "to_latex": None, "to_markdown": None, "to_numpy": ((), {}),
    "to_orc": None, "to_parquet": None, "to_period": None, "to_pickle": None,
    "to_records": None, "to_sql": None, "to_stata": None, "to_string": None,
    "to_timestamp": None, "to_xarray": None, "to_xml": None,
    "transform": None, "transpose": None, "truediv": None, "truncate": None,
    "tz_convert": None, "tz_localize": None, "unstack": None, "update": None,
    "value_counts": ((), {"subset": ["g"]}), "var": ((), {"numeric_only": True}),
    "where": None, "xs": (("x",), {"axis": 0, "drop_level": True}) if False else None,
}


def _norm(x):
    if hasattr(x, "to_pandas"):
        x = x.to_pandas()
    if isinstance(x, (pd.DataFrame, pd.Series)):
        return x
    if isinstance(x, (np.ndarray, pd.Index, pd.Categorical)):
        return list(np.asarray(x))
    return x


def _match(a, b):
    a, b = _norm(a), _norm(b)
    try:
        if isinstance(a, pd.DataFrame) and isinstance(b, pd.DataFrame):
            pd.testing.assert_frame_equal(b, a, check_dtype=False, check_index_type=False,
                                          check_column_type=False, check_categorical=False)
            return True
        if isinstance(a, pd.Series) and isinstance(b, pd.Series):
            pd.testing.assert_series_equal(b, a, check_dtype=False, check_index_type=False,
                                           check_categorical=False, check_freq=False)
            return True
        if isinstance(a, float) and isinstance(b, float) and np.isnan(a) and np.isnan(b):
            return True
        if isinstance(a, list) and isinstance(b, list):
            def cell_eq(x, y):
                if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
                    return _match(list(np.asarray(x)), list(np.asarray(y)))
                try:
                    if pd.isna(x) and pd.isna(y):
                        return True
                except (ValueError, TypeError):
                    pass
                return bool(x == y)
            return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
        if isinstance(a, dict) and isinstance(b, dict):
            if set(a) != set(b):
                return False
            return all(_match(a[k], b[k]) for k in a)
        try:
            if pd.isna(a) and pd.isna(b):
                return True
        except (ValueError, TypeError):
            pass
        return bool(a == b)
    except Exception:
        return False


def sweep(kind, args_table, make_p, make_m):
    diffs, passes, skipped = [], 0, 0
    for name in sorted(args_table):
        spec = args_table[name]
        if spec is None:
            skipped += 1
            continue
        a, k = spec
        try:
            exp = getattr(make_p(), name)(*a, **k)
            exp_exc = None
        except Exception as e:
            exp, exp_exc = None, type(e).__name__
        try:
            got = getattr(make_m(), name)(*a, **k)
            got_exc = None
        except Exception as e:
            got, got_exc = None, type(e).__name__
        if got_exc is None:
            # engine is lazy: force materialization so plan-time errors
            # surface here, not inside the comparator
            try:
                got = _norm(got)
            except Exception as e:
                got, got_exc = None, type(e).__name__
        if exp_exc or got_exc:
            if exp_exc == got_exc:
                passes += 1
            else:
                diffs.append((name, f"exc {exp_exc} vs {got_exc}"))
            continue
        if _match(exp, got):
            passes += 1
        else:
            diffs.append((name, f"exp={str(_norm(exp))[:90]!r} got={str(_norm(got))[:90]!r}"))
    print(f"\n== {kind}: {passes} pass, {len(diffs)} diff, {skipped} skipped ==")
    for n, d in diffs:
        print(f"DIFF {kind}.{n}: {d}")
    return diffs




# ---------------------------------------------------------------- accessors
STR_SER = dict(data=["Foo bar", "baz", None, "  Quux  "], name="t")
DT_SER = dict(data=pd.to_datetime(["2024-03-05 10:30:45", "2023-12-31 23:59:59",
                                   None, "2024-07-01 00:00:00"]), name="ts")

STR_ARGS = {
    "capitalize": ((), {}), "casefold": ((), {}), "center": ((10,), {}),
    "contains": (("ba",), {}), "count": (("a",), {}), "endswith": (("z",), {}),
    "find": (("a",), {}), "fullmatch": (("baz",), {}), "get": ((0,), {}),
    "index": None, "isalnum": ((), {}), "isalpha": ((), {}), "isdecimal": ((), {}),
    "isdigit": ((), {}), "islower": ((), {}), "isnumeric": ((), {}),
    "isspace": ((), {}), "istitle": ((), {}), "isupper": ((), {}),
    "join": None, "len": ((), {}), "ljust": ((10,), {}), "lower": ((), {}),
    "lstrip": ((), {}), "match": (("ba",), {}), "normalize": None,
    "pad": ((10,), {}), "partition": None, "removeprefix": (("Foo",), {}),
    "removesuffix": (("z",), {}), "repeat": ((2,), {}), "replace": (("a", "X"), {}),
    "rfind": (("a",), {}), "rindex": None, "rjust": ((10,), {}),
    "rpartition": None, "rsplit": None, "rstrip": ((), {}),
    "slice": ((1, 3), {}), "slice_replace": ((1, 3, "Z"), {}),
    "split": ((" ",), {}), "startswith": (("F",), {}), "strip": ((), {}),
    "swapcase": ((), {}), "title": ((), {}), "translate": None,
    "upper": ((), {}), "wrap": None, "zfill": ((8,), {}),
    "extract": ((r"(\w+)",), {}), "findall": ((r"\w+",), {}),
}

DT_ARGS = {
    "ceil": (("h",), {}), "date": "prop", "day": "prop", "day_name": ((), {}),
    "day_of_week": "prop", "day_of_year": "prop", "dayofweek": "prop",
    "dayofyear": "prop", "days_in_month": "prop", "daysinmonth": "prop",
    "floor": (("h",), {}), "hour": "prop", "is_leap_year": "prop",
    "is_month_end": "prop", "is_month_start": "prop", "is_quarter_end": "prop",
    "is_quarter_start": "prop", "is_year_end": "prop", "is_year_start": "prop",
    "isocalendar": ((), {}), "microsecond": "prop", "minute": "prop",
    "month": "prop", "month_name": ((), {}), "nanosecond": "prop",
    "normalize": ((), {}), "quarter": "prop", "round": (("h",), {}),
    "second": "prop", "strftime": (("%Y-%m-%d",), {}), "time": None,
    "to_period": None, "to_pydatetime": None, "tz": None, "tz_convert": None,
    "tz_localize": None, "weekday": "prop", "year": "prop",
}


def sweep_accessor(kind, acc, args_table, data):
    diffs, passes, skipped = [], 0, 0
    for name in sorted(args_table):
        spec = args_table[name]
        if spec is None:
            skipped += 1
            continue
        def run(lib):
            ns = getattr(lib.Series(**data), acc)
            if spec == "prop":
                return getattr(ns, name)
            a, k = spec
            return getattr(ns, name)(*a, **k)
        try:
            exp, exp_exc = run(pd), None
        except Exception as e:
            exp, exp_exc = None, type(e).__name__
        try:
            got, got_exc = _norm(run(mpd)), None
        except Exception as e:
            got, got_exc = None, type(e).__name__
        if exp_exc or got_exc:
            if exp_exc == got_exc:
                passes += 1
            else:
                diffs.append((name, f"exc {exp_exc} vs {got_exc}"))
            continue
        if _match(exp, got):
            passes += 1
        else:
            diffs.append((name, f"exp={str(_norm(exp))[:90]!r} got={str(_norm(got))[:90]!r}"))
    print(f"\n== {kind}: {passes} pass, {len(diffs)} diff, {skipped} skipped ==")
    for n, d in diffs:
        print(f"DIFF {kind}.{n}: {d}")
    return diffs


# ------------------------------------------------- datetime-index fixtures
TIDX = pd.date_range("2024-01-01 09:00", periods=6, freq="7h")
TS_SER = dict(data=[1.0, 2.0, np.nan, 4.0, 5.0, 6.0], index=TIDX, name="v")

TS_ARGS = {
    "asfreq": (("12h",), {}),
    "at_time": (("09:00",), {}),
    "between_time": (("08:00", "18:00"), {}),
    "first": (("1D",), {}),
    "last": (("1D",), {}),
    "truncate": ((), {"before": "2024-01-01 12:00"}),
    "resample": None,  # covered by dedicated resample tests
    "to_period": None,
    "shift": ((1,), {"freq": "7h"}),
    "idxmax": ((), {}),
    "asof": ((pd.Timestamp("2024-01-01 20:00"),), {}),
    "interpolate": ((), {"method": "time"}),
    "sort_index": ((), {"ascending": False}),
}


# ---------------------------------------------------------------- groupby
GB_DF = dict(data={"k": ["a", "b", "a", "b", "a"],
                   "v": [1.0, 2.0, np.nan, 4.0, 5.0],
                   "w": [10, 20, 30, 40, 50]})

GB_ARGS = {
    "agg": (({"v": "sum", "w": "mean"},), {}),
    "aggregate": (("sum",), {}),
    "all": ((), {}), "any": ((), {}),
    "apply": None, "bfill": ((), {}), "corr": None, "count": ((), {}),
    "cumcount": ((), {}), "cummax": ((), {}), "cummin": ((), {}),
    "cumprod": ((), {}), "cumsum": ((), {}),
    "describe": ((), {}), "diff": ((), {}), "ffill": ((), {}),
    "fillna": None, "filter": ((lambda g: g["v"].sum() > 5,), {}),
    "first": ((), {}), "head": ((1,), {}), "idxmax": ((), {}),
    "idxmin": ((), {}), "last": ((), {}), "max": ((), {}), "mean": ((), {}),
    "median": ((), {}), "min": ((), {}), "ngroup": ((), {}),
    "nth": ((1,), {}), "nunique": ((), {}), "ohlc": None,
    "pct_change": ((), {}), "pipe": ((lambda g: g.sum(),), {}),
    "prod": ((), {}), "quantile": ((0.5,), {}), "rank": ((), {}),
    "resample": None, "rolling": None, "sample": None, "sem": ((), {}),
    "shift": ((1,), {}), "size": ((), {}), "skew": ((), {}),
    "std": ((), {}), "sum": ((), {}), "tail": ((1,), {}),
    "take": None, "transform": (("mean",), {}), "var": ((), {}),
    "value_counts": ((), {}),
}



# ------------------------------------------------- window/resample sweeps
ROLL_ARGS = {
    "sum": ((), {}), "mean": ((), {}), "min": ((), {}), "max": ((), {}),
    "std": ((), {}), "var": ((), {}), "median": ((), {}), "count": ((), {}),
    "sem": ((), {}), "skew": ((), {}), "kurt": ((), {}),
    "quantile": ((0.5,), {}), "apply": ((lambda x: x.max() - x.min(),), {}),
    "rank": ((), {}), "sum_extra": None,
}

EXP_ARGS = {k: v for k, v in ROLL_ARGS.items() if k not in ("rank",)}

EWM_ARGS = {"mean": ((), {}), "std": ((), {}), "var": ((), {}), "sum": ((), {})}

RES_ARGS = {
    "sum": ((), {}), "mean": ((), {}), "count": ((), {}), "min": ((), {}),
    "max": ((), {}), "median": ((), {}), "std": ((), {}), "var": ((), {}),
    "first": ((), {}), "last": ((), {}), "nunique": ((), {}), "size": ((), {}),
    "asfreq": ((), {}), "ffill": ((), {}), "bfill": ((), {}),
    "nearest": ((), {}), "interpolate": ((), {}),
}


def sweep_windowed(kind, args_table, make_obj_p, make_obj_m):
    diffs, passes, skipped = [], 0, 0
    for name in sorted(args_table):
        spec = args_table[name]
        if spec is None:
            skipped += 1
            continue
        a, k = spec
        try:
            exp, exp_exc = getattr(make_obj_p(), name)(*a, **k), None
        except Exception as e:
            exp, exp_exc = None, type(e).__name__
        try:
            got, got_exc = _norm(getattr(make_obj_m(), name)(*a, **k)), None
        except Exception as e:
            got, got_exc = None, type(e).__name__
        if exp_exc or got_exc:
            if exp_exc == got_exc:
                passes += 1
            else:
                diffs.append((name, f"exc {exp_exc} vs {got_exc}"))
            continue
        if _match(exp, got):
            passes += 1
        else:
            diffs.append((name, f"exp={str(_norm(exp))[:90]!r} got={str(_norm(got))[:90]!r}"))
    print(f"\n== {kind}: {passes} pass, {len(diffs)} diff, {skipped} skipped ==")
    for n, d in diffs:
        print(f"DIFF {kind}.{n}: {d}")
    return diffs



# ------------------------------------------------------ MultiIndex sweeps
def _mi_df(lib):
    pdf = pd.DataFrame({
        "l1": ["a", "a", "b", "b"], "l2": [1, 2, 1, 2],
        "v": [10.0, 20.0, 30.0, 40.0], "w": [1, 2, 3, 4],
    })
    if lib is pd:
        return pdf.set_index(["l1", "l2"])
    return lib.DataFrame(pdf).set_index(["l1", "l2"])


MI_ARGS = {
    "reset_index": ((), {}),
    "reset_index_level": None,
    "droplevel": (("l1",), {}),
    "swaplevel": ((), {}),
    "sort_index": ((), {}),
    "unstack": ((), {}),
    "stack": None,
    "xs": (("a",), {}),
    "head": ((2,), {}),
    "sum": ((), {"numeric_only": True}),
    "rename_axis": None,
    "to_pandas_roundtrip": None,
}


def sweep_mi():
    diffs, passes = [], 0
    for name in sorted(MI_ARGS):
        spec = MI_ARGS[name]
        if spec is None:
            continue
        a, k = spec
        try:
            exp, exp_exc = getattr(_mi_df(pd), name)(*a, **k), None
        except Exception as e:
            exp, exp_exc = None, type(e).__name__
        try:
            got, got_exc = _norm(getattr(_mi_df(mpd), name)(*a, **k)), None
        except Exception as e:
            got, got_exc = None, type(e).__name__
        if exp_exc or got_exc:
            ok = exp_exc == got_exc
        else:
            ok = _match(exp, got)
        passes += ok
        if not ok:
            diffs.append((name, f"exp={str(_norm(exp))[:110]!r} got={str(_norm(got))[:110]!r} exc={exp_exc}/{got_exc}"))
    # groupby on a level + agg over the other
    try:
        exp = _mi_df(pd).groupby(level="l2")["v"].sum()
        got = _norm(_mi_df(mpd).groupby(level="l2")["v"].sum())
        ok = _match(exp, got)
    except Exception as e:
        ok, got = False, type(e).__name__
    passes += ok
    if not ok:
        diffs.append(("groupby_level_name", f"{got!r}"))
    print(f"\n== MultiIndex: {passes} pass, {len(diffs)} diff ==")
    for n, d in diffs:
        print(f"DIFF MultiIndex.{n}: {d}")
    return diffs


if __name__ == "__main__":
    d1 = sweep("Series", SER_ARGS,
               lambda: pd.Series(**SER_DATA), lambda: mpd.Series(**SER_DATA))
    d2 = sweep("DataFrame", DF_ARGS,
               lambda: pd.DataFrame(**DF_DATA), lambda: mpd.DataFrame(**DF_DATA))
    d3 = sweep_accessor("Series.str", "str", STR_ARGS, STR_SER)
    d4 = sweep_accessor("Series.dt", "dt", DT_ARGS, DT_SER)
    d5 = sweep("Series[ts-index]", TS_ARGS,
               lambda: pd.Series(**TS_SER), lambda: mpd.Series(**TS_SER))
    d6 = sweep("GroupBy", GB_ARGS,
               lambda: pd.DataFrame(**GB_DF).groupby("k"),
               lambda: mpd.DataFrame(**GB_DF).groupby("k"))
    d7 = sweep_windowed("Rolling", ROLL_ARGS,
        lambda: pd.Series(**TS_SER).rolling(3, min_periods=1),
        lambda: mpd.Series(**TS_SER).rolling(3, min_periods=1))
    d8 = sweep_windowed("Expanding", EXP_ARGS,
        lambda: pd.Series(**TS_SER).expanding(),
        lambda: mpd.Series(**TS_SER).expanding())
    d9 = sweep_windowed("EWM", EWM_ARGS,
        lambda: pd.Series(**TS_SER).ewm(span=3),
        lambda: mpd.Series(**TS_SER).ewm(span=3))
    d10 = sweep_windowed("Resampler", RES_ARGS,
        lambda: pd.Series(**TS_SER).resample("5h"),
        lambda: mpd.Series(**TS_SER).resample("5h"))
    d11 = sweep_mi()
    print(f"\nTOTAL DIFFS: {len(d1)+len(d2)+len(d3)+len(d4)+len(d5)+len(d6)+len(d7)+len(d8)+len(d9)+len(d10)+len(d11)}")
