"""Probe wave 12: the remaining kwarg/edge long tail vs real pandas.

Same protocol as waves 10/11 (tools/probe_wave10.py): identical input, one
not-yet-swept kwarg or edge shape per probe, exact comparison. Divergences
become fixes plus regression tests in tests/test_round9_fixes.py.

Usage: python tools/probe_wave12.py
"""

from __future__ import annotations

import os
import sys
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
                    check_dtype=False, check_index_type=False,
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


cmp("dropna(thresh=)", lambda df: df.assign(c2=[None, 1.0, None, 2.0, None, 3.0]).dropna(thresh=4).reset_index(drop=True).pipe(srt))
cmp("fillna(limit=)", lambda df: df[["c"]].fillna(-1, limit=1).pipe(srt))
cmp("ffill(limit=)", lambda df: df.assign(c2=[1.0, None, None, None, 2.0, None])[["c2"]].ffill(limit=2))
cmp("interpolate(limit_direction=backward)", lambda df: df.assign(c2=[None, None, 2.0, None, 4.0, None])[["c2"]].interpolate(limit_direction="backward"))
cmp("pct_change(fill_method=None)", lambda df: df[["c"]].pct_change(fill_method=None))
cmp("diff(axis=1)", lambda df: df[["c", "d"]].diff(axis=1))
cmp("rank(axis=1)", lambda df: df[["c", "d", "a"]].rank(axis=1))
cmp("quantile(axis=1)", lambda df: df[["c", "d"]].quantile(0.5, axis=1))
cmp("nunique(axis=1)", lambda df: df[["a", "d"]].nunique(axis=1))
cmp("skew(axis=1)", lambda df: df[["a", "c", "d"]].skew(axis=1))
cmp("mode(axis=1)", lambda df: df.assign(e=lambda x: x["a"])[["a", "e", "d"]].mode(axis=1).fillna(-1).pipe(srt))
cmp("prod(min_count=)", lambda df: df.head(0)[["d"]].prod(min_count=1))
cmp("sum(min_count groupby)", lambda df: df.assign(c2=[None] * 6).groupby("b")["c2"].sum(min_count=1).reset_index().pipe(srt))
cmp("groupby.rank(pct)", lambda df: df.groupby("b")["d"].rank(method="average", pct=True).sort_values().reset_index(drop=True))
cmp("groupby.idxmax(skipna)", lambda df: df.dropna(subset=["c"]).groupby("b")["c"].idxmax().sort_values().reset_index(drop=True))
cmp("map(na_action=ignore)", lambda df: df["c"].map(lambda v: v * 2, na_action="ignore"))
cmp("apply(axis=1,result_type=expand)", lambda df: df.apply(lambda r: [r["d"], r["d"] * 2], axis=1, result_type="expand").pipe(srt))
cmp("str.extractall", lambda df: df.assign(s=["a1b2", "c3", "d4e5", "f", "g6", "h7i8"])["s"].str.extractall(r"(\d)").reset_index(drop=True).pipe(srt))
cmp("str.findall", lambda df: df.assign(s=["a1b2", "c3", "d4e5", "f", "g6", "h7i8"])["s"].str.findall(r"\d").apply(lambda l: ",".join(l)))
cmp("str.get_dummies", lambda df: df.assign(s=["p|q", "q", "p", "r|p", "q|r", "p"])["s"].str.get_dummies().pipe(srt))
cmp("str.cat(others,sep)", lambda df: df["b"].str.cat(df["b"], sep="-"))
cmp("get_dummies(drop_first,prefix_sep)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).get_dummies(df[["b"]], drop_first=True, prefix_sep="::").pipe(srt))
cmp("factorize order", lambda df: list((pd if isinstance(df, pd.DataFrame) else mpd).factorize(df["b"])[0]) == [0, 1, 0, 2, 1, 0])
cmp("qcut(duplicates=drop)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).qcut(df.assign(e=[1, 1, 1, 1, 2, 3])["e"], 3, duplicates="drop", labels=False))
cmp("cut(include_lowest)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).cut(df["d"], [10, 30, 60], include_lowest=True, labels=False))
cmp("select_dtypes(exclude=)", lambda df: df.select_dtypes(exclude=["object"]).pipe(srt))
cmp("rename(mapper,axis=1)", lambda df: df.rename(str.upper, axis=1).pipe(srt))
cmp("drop(index+columns)", lambda df: df.drop(index=[0, 2], columns=["b"]).reset_index(drop=True).pipe(srt))
cmp("reindex(columns,fill_value)", lambda df: df.reindex(columns=["d", "zz"], fill_value=0).pipe(srt))
cmp("update(overwrite=False)", lambda df: (lambda x: (x.update(type(x)({"c": [9.0] * 6}), overwrite=False), x)[1])(df[["c", "d"]]).pipe(srt))
cmp("searchsorted(side=right)", lambda df: int(df["d"].searchsorted(30, side="right")))
cmp("value_counts(ascending)", lambda df: df["b"].value_counts(ascending=True).reset_index(drop=True))
cmp("nlargest(keep=last)", lambda df: df.assign(e=[1, 2, 2, 3, 3, 3])["e"].nlargest(2, keep="last").reset_index(drop=True))
cmp("sem(ddof=0)", lambda df: float(df["d"].sem(ddof=0)))
cmp("to_numeric(downcast)", lambda df: (pd if isinstance(df, pd.DataFrame) else mpd).to_numeric(df["d"], downcast="integer"))
cmp("assign(callable chain)", lambda df: df.assign(e=lambda x: x["d"] * 2, f=lambda x: x["e"] + 1).pipe(srt))
cmp("where(callable)", lambda df: df[["d"]].where(lambda x: x > 25, -1).pipe(srt))
cmp("squeeze(axis=1)", lambda df: df[["d"]].squeeze(axis=1))
cmp("droplevel(axis=1)", lambda df: df.groupby("b").agg({"d": ["sum", "max"]}).droplevel(0, axis=1).reset_index().pipe(srt))
cmp("swapaxes", lambda df: df.head(2)[["a", "d"]].swapaxes(0, 1).reset_index(drop=True))
print("probe wave 12 complete")
