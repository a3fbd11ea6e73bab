"""Probe wave 28 (round 11): set_index append/reset level, sample variants,
month_name/day_name, pad, applymap na_action, to_numeric errors, isin
variants, ufunc interop, rank on strings, value_counts(sort=False)."""
import warnings; warnings.filterwarnings("ignore")
import os
os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = "0"
import numpy as np, pandas as pd
import modin_spark.pandas as mpd

results = {"OK": 0, "DIFF": 0, "FAIL": 0}

def probe(name, fn_p, fn_m, norm=None):
    try:
        want = fn_p()
    except Exception as e:
        print(f"SKIP  {name}: pandas itself: {type(e).__name__} {str(e)[:60]}")
        return
    try:
        got = fn_m()
        if norm:
            want, got = norm(want), norm(got)
        same = got == want or str(got) == str(want)
        if not same and isinstance(want, list) and isinstance(got, list) and len(want) == len(got):
            same = all((x == y) or (pd.isna(x) and pd.isna(y)) for x, y in zip(want, got))
        if same:
            results["OK"] += 1; print(f"OK    {name}")
        else:
            results["DIFF"] += 1; print(f"DIFF  {name}: pandas={str(want)[:80]} engine={str(got)[:80]}")
    except Exception as e:
        results["FAIL"] += 1
        print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:110]}")

P = pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                  "k": list("xyxyx"), "g": list("mmnnm"),
                  "t": pd.date_range("2024-01-05", periods=5, freq="D")})
def M(): return mpd.from_pandas(P)

probe("set_index append=True", lambda: [tuple(map(str, x)) for x in P.set_index("k").set_index("g", append=True).index],
      lambda: [tuple(map(str, x)) for x in mpd.from_pandas(P.set_index("k")).set_index("g", append=True).to_pandas().index])
probe("reset_index level=", lambda: list(P.set_index(["k","g"]).reset_index(level="g").columns),
      lambda: list(mpd.from_pandas(P.set_index(["k","g"])).reset_index(level="g").columns))
probe("sample frac replace", lambda: P.sample(frac=2.0, replace=True, random_state=3).shape,
      lambda: M().sample(frac=2.0, replace=True, random_state=3).shape)
probe("dt.month_name", lambda: P.t.dt.month_name().tolist(), lambda: M().t.dt.month_name().to_pandas().tolist())
probe("dt.day_name", lambda: P.t.dt.day_name().tolist(), lambda: M().t.dt.day_name().to_pandas().tolist())
probe("str.pad side=both", lambda: P.k.str.pad(5, side="both", fillchar="*").tolist(),
      lambda: M().k.str.pad(5, side="both", fillchar="*").to_pandas().tolist())
probe("str.center", lambda: P.k.str.center(5, "-").tolist(), lambda: M().k.str.center(5, "-").to_pandas().tolist())
probe("df.map na_action", lambda: P[["k"]].map(lambda v: v.upper(), na_action="ignore").k.tolist(),
      lambda: M()[["k"]].map(lambda v: v.upper(), na_action="ignore").to_pandas().k.tolist())
probe("to_numeric errors=coerce", lambda: pd.to_numeric(pd.Series(["1", "x", "3"]), errors="coerce").fillna(-9).tolist(),
      lambda: mpd.to_numeric(mpd.from_pandas(pd.DataFrame({"x": ["1", "x", "3"]})).x, errors="coerce").to_pandas().fillna(-9).tolist())
probe("isin dict per column", lambda: P[["a","k"]].isin({"a": [1, 3]}).values.tolist(),
      lambda: M()[["a","k"]].isin({"a": [1, 3]}).to_pandas().values.tolist())
probe("series.isin series", lambda: P.a.isin(P.a.head(2)).tolist(),
      lambda: M().a.isin(M().a.head(2)).to_pandas().tolist())
probe("np.log ufunc", lambda: np.log(P.a).round(5).tolist(), lambda: np.log(M().a).round(5).to_pandas().tolist())
probe("np.sqrt frame ufunc", lambda: np.sqrt(P[["a"]]).a.round(5).tolist(),
      lambda: np.sqrt(M()[["a"]]).to_pandas().a.round(5).tolist())
probe("rank strings", lambda: P.k.rank(method="dense").tolist(), lambda: M().k.rank(method="dense").to_pandas().tolist())
probe("value_counts sort=False", lambda: P.k.value_counts(sort=False).to_dict(),
      lambda: M().k.value_counts(sort=False).to_pandas().to_dict())
probe("df.sum axis=1 skipna=False", lambda: P[["a","b"]].sum(axis=1, skipna=False).fillna(-9).tolist(),
      lambda: M()[["a","b"]].sum(axis=1, skipna=False).to_pandas().fillna(-9).tolist())
probe("df.mean axis=1", lambda: P[["a","b"]].mean(axis=1).round(4).tolist(),
      lambda: M()[["a","b"]].mean(axis=1).to_pandas().round(4).tolist())
probe("series.dot", lambda: float(P.a.dot(P.a)), lambda: float(M().a.dot(M().a)))
probe("df.dot series", lambda: P[["a","b"]].fillna(0).dot(pd.Series([2.0, 3.0], index=["a","b"])).tolist(),
      lambda: M()[["a","b"]].fillna(0).dot(pd.Series([2.0, 3.0], index=["a","b"])).to_pandas().tolist())
probe("sort_values by index name after reset", lambda: P.set_index("k").sort_values("a").a.tolist(),
      lambda: mpd.from_pandas(P.set_index("k")).sort_values("a").to_pandas().a.tolist())
probe("nsmallest frame", lambda: P.nsmallest(2, "a").a.tolist(), lambda: M().nsmallest(2, "a").to_pandas().a.tolist())
probe("df.prod", lambda: P[["a"]].prod().tolist(), lambda: M()[["a"]].prod().tolist())
probe("series.cumsum datetime-safe skip", lambda: P.a.astype(float).cumsum().tolist(),
      lambda: M().a.astype(float).cumsum().to_pandas().tolist())
probe("expanding.sum min_periods default", lambda: P.b.expanding().sum().fillna(-9).tolist(),
      lambda: M().b.expanding().sum().to_pandas().fillna(-9).tolist())
probe("df.notna", lambda: P.notna().b.tolist(), lambda: M().notna().to_pandas().b.tolist())
probe("series.ge fill_value", lambda: P.b.ge(1.0).tolist(), lambda: M().b.ge(1.0).to_pandas().tolist())
probe("df.query index token", lambda: P.set_index("a").query("index > 2").b.fillna(-9).tolist(),
      lambda: mpd.from_pandas(P.set_index("a")).query("index > 2").to_pandas().b.fillna(-9).tolist())
probe("series.astype category ordered compare", lambda: (P.k.astype(pd.CategoricalDtype(["x","y"], ordered=True)) > "x").tolist(),
      lambda: (M().k.astype(pd.CategoricalDtype(["x","y"], ordered=True)) > "x").to_pandas().tolist())

print(f"\nTOTALS {results}")
