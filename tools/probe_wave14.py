"""Probe wave 14: inplace variants, IO kwargs, window/resample tail vs pandas.

Same protocol as waves 10-13. Divergences become fixes plus regression
tests in tests/test_round9_wave14.py.

Usage: python tools/probe_wave14.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import modin_spark.pandas as mpd  # noqa: E402

PDF = pd.DataFrame(
    {
        "a": [3, 1, 2, 1, 3, 2],
        "b": ["x", "y", "x", "z", "y", "x"],
        "c": [1.5, 2.5, None, 4.5, 5.5, 6.5],
        "d": [10, 20, 30, 40, 50, 60],
    }
)


def cmp(name: str, fn):
    try:
        got = fn(mpd.DataFrame(PDF.copy()))
        want = fn(PDF.copy())
        if isinstance(want, pd.DataFrame):
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            try:
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True), want.reset_index(drop=True),
                    check_dtype=False, check_index_type=False, check_column_type=False,
                )
                print(f"OK       {name}")
            except AssertionError as e:
                print(f"DIVERGE  {name}: {str(e).splitlines()[-1][:160]}")
        elif isinstance(want, pd.Series):
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            try:
                pd.testing.assert_series_equal(
                    got.reset_index(drop=True), want.reset_index(drop=True),
                    check_dtype=False, check_index_type=False, check_names=False,
                )
                print(f"OK       {name}")
            except AssertionError as e:
                print(f"DIVERGE  {name}: {str(e).splitlines()[-1][:160]}")
        else:
            g = got if not hasattr(got, "to_pandas") else got.to_pandas()
            if (isinstance(want, float) and np.isnan(want) and isinstance(g, float) and np.isnan(g)) or g == want:
                print(f"OK       {name}")
            else:
                print(f"DIVERGE  {name}: got {g!r} want {want!r}")
    except Exception as e:
        tb = traceback.format_exc().splitlines()
        print(f"ERROR    {name}: {type(e).__name__}: {str(e)[:140]} @ {tb[-3].strip()[:100]}")


def srt(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---- inplace variants
def _inp(df, meth, *a, **k):
    out = df.copy() if isinstance(df, pd.DataFrame) else df[df.columns]
    r = getattr(out, meth)(*a, **k, inplace=True)
    assert r is None, f"{meth}(inplace=True) must return None"
    return out


cmp("fillna(inplace)", lambda df: _inp(df, "fillna", -1).pipe(srt))
cmp("drop(inplace)", lambda df: _inp(df, "drop", columns=["b"]).pipe(srt))
cmp("rename(inplace)", lambda df: _inp(df, "rename", columns={"d": "dd"}).pipe(srt))
cmp("reset_index(inplace)", lambda df: _inp(df.set_index("b"), "reset_index").pipe(srt))
cmp("set_index(inplace)", lambda df: _inp(df, "set_index", "b").reset_index().pipe(srt))
cmp("sort_values(inplace)", lambda df: _inp(df, "sort_values", "d", ascending=False).reset_index(drop=True))
cmp("replace(inplace)", lambda df: _inp(df, "replace", {"x": "xx"}).pipe(srt))
cmp("dropna(inplace)", lambda df: _inp(df, "dropna", subset=["c"]).reset_index(drop=True).pipe(srt))
cmp("clip(inplace)", lambda df: _inp(df[["d"]], "clip", 15, 45).pipe(srt))
cmp("series.fillna(inplace)", lambda df: (lambda s: (s.fillna(-1, inplace=True), s)[1])(df["c"]))

# ---- IO kwargs (roundtrips through temp files)
def _csv_round(df, **kw):
    lib = pd if isinstance(df, pd.DataFrame) else mpd
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.csv")
        pd.DataFrame(PDF).to_csv(path, index=False)
        out = lib.read_csv(path, **kw)
        # materialize INSIDE the tempdir context (Spark reads lazily)
        return out.to_pandas() if hasattr(out, "to_pandas") else out


cmp("read_csv(names+header=0)", lambda df: _csv_round(df, header=0, names=["w", "x", "y", "z"]).pipe(srt))
cmp("read_csv(dtype=)", lambda df: _csv_round(df, dtype={"d": "float64"})[["d"]].pipe(srt))
cmp("read_csv(index_col=)", lambda df: _csv_round(df, index_col="b").reset_index().pipe(srt))
cmp("read_csv(usecols callable)", lambda df: _csv_round(df, usecols=lambda c: c in ("a", "d")).pipe(srt))


def _csv_out(df, **kw):
    import glob
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "o.csv")
        df.to_csv(path, index=False, **kw)
        # Spark writes a directory of part files; pandas writes one file
        files = sorted(glob.glob(os.path.join(path, "part-*"))) if os.path.isdir(path) else [path]
        return pd.concat([pd.read_csv(f, sep=kw.get("sep", ",")) for f in files], ignore_index=True)


cmp("to_csv(sep=;,na_rep=NA)", lambda df: _csv_out(df, sep=";", na_rep="NA").pipe(srt))

# ---- window / resample tail
cmp("rolling(min_periods=1).sum", lambda df: df["c"].rolling(3, min_periods=1).sum())
cmp("rolling.agg(list)", lambda df: df["d"].rolling(2).agg(["sum", "mean"]).reset_index(drop=True).pipe(srt))
cmp("rolling.corr(other)", lambda df: df["d"].rolling(3).corr(df["c"]))
cmp("expanding.apply", lambda df: df["d"].expanding(2).apply(lambda x: x.max() - x.min()))
cmp("rank(dense desc)", lambda df: df["d"].rank(method="dense", ascending=False))
cmp("melt(var/value names)", lambda df: df.melt(id_vars=["b"], value_vars=["a", "d"], var_name="k", value_name="v").pipe(srt))
cmp("replace(dict of dicts)", lambda df: df.replace({"b": {"x": "X"}, "d": {10: 11}}).pipe(srt))
cmp("fillna(axis=1-ish bfill cols)", lambda df: df[["c", "d"]].bfill(axis=1).pipe(srt))
cmp("stack(dropna legacy)", lambda df: df[["a", "c"]].stack().reset_index(drop=True).sort_values().reset_index(drop=True))
cmp("groupby(by=[series,col])", lambda df: df.groupby([df["a"] > 1, "b"])["d"].sum().reset_index(drop=True).sort_values().reset_index(drop=True))
cmp("groupby.agg(lambda with args)", lambda df: df.groupby("b")["d"].agg(lambda s, k: s.max() + k, 5).reset_index().pipe(srt))
cmp("convert_dtypes roundtrip", lambda df: df.convert_dtypes()[["a", "d"]].sum())
cmp("wide_to_long", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).wide_to_long(
    df.rename(columns={"a": "v1", "d": "v2"}).assign(id=list(range(6))),
    ["v"], i="id", j="n").reset_index()[["id", "n", "b", "c", "v"]].pipe(srt))
cmp("resample(2h,origin=start)", lambda df: df.assign(
    t=pd.date_range("2024-01-01 00:30", periods=6, freq="50min")).set_index("t")["d"]
    .resample("2h", origin="start").sum().reset_index(drop=True))
cmp("asfreq(30min)", lambda df: df.assign(
    t=pd.date_range("2024-01-01", periods=6, freq="h")).set_index("t")["d"]
    .asfreq("30min").reset_index(drop=True))
cmp("nsmallest(keep=first dup)", lambda df: df.assign(e=[2, 1, 1, 3, 1, 4])["e"].nsmallest(2).reset_index(drop=True))
cmp("query(index ref)", lambda df: df.set_index("a").query("index > 1").reset_index().pipe(srt))
cmp("series.astype(category).codes", lambda df: df["b"].astype("category").cat.codes.sort_values().reset_index(drop=True))
cmp("dt.to_period(M) str", lambda df: df.assign(t=pd.date_range("2024-01-15", periods=6, freq="ME"))["t"].dt.to_period("M").astype(str))
print("probe wave 14 complete")
