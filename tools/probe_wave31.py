"""Probe wave 31 (round 11): categorical groupby unobserved cats, interval
ops on cut results, agg axis=1, clip with frames, corrwith axis, idxmax on
frame ties, nth dropna, pivot duplicate error parity, eval assignment
chains referencing @vars, rolling var ddof."""
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
        want = ("RAISES", type(e).__name__)
    try:
        got = fn_m()
    except Exception as e:
        got = ("RAISES", type(e).__name__)
    if isinstance(want, tuple) and want and want[0] == "RAISES":
        ok = isinstance(got, tuple) and got and got[0] == "RAISES"
        results["OK" if ok else "DIFF"] += 1
        print(("OK   " if ok else "DIFF ") + f" {name}: want {want} got {str(got)[:60]}")
        return
    if isinstance(got, tuple) and got and got[0] == "RAISES":
        results["FAIL"] += 1
        print(f"FAIL  {name}: engine raised {got[1]}")
        return
    if norm:
        want, got = norm(want), norm(got)
    same = got == want or str(got) == str(want)
    if not same and isinstance(want, list) and isinstance(got, list) and len(want) == len(got):
        same = all((x == y) or (pd.isna(x) and pd.isna(y)) for x, y in zip(want, got))
    if same:
        results["OK"] += 1; print(f"OK    {name}")
    else:
        results["DIFF"] += 1; print(f"DIFF  {name}: pandas={str(want)[:80]} engine={str(got)[:80]}")

P = pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5], "k": list("xyxyz")})
def M(): return mpd.from_pandas(P)

probe("agg axis=1 sum", lambda: P[["a","b"]].agg("sum", axis=1).fillna(-9).tolist(),
      lambda: M()[["a","b"]].agg("sum", axis=1).to_pandas().fillna(-9).tolist())
probe("agg list axis=0", lambda: P[["a"]].agg(["sum", "mean"]).values.tolist(),
      lambda: np.asarray(M()[["a"]].agg(["sum", "mean"]).values).tolist())
probe("clip frame bounds", lambda: P[["a"]].clip(lower=P[["a"]] * 0 + 2).a.tolist(),
      lambda: M()[["a"]].clip(lower=M()[["a"]] * 0 + 2).to_pandas().a.tolist())
probe("pivot duplicate raises", lambda: P.pivot(index="k", columns="a", values="b"),
      lambda: M().pivot(index="k", columns="a", values="b"), norm=lambda x: "frame")
probe("df.idxmax tie first", lambda: P.assign(z=[5,5,1,2,0]).idxmax().z,
      lambda: M().assign(z=[5,5,1,2,0]).idxmax().z)
probe("groupby.nth list", lambda: P.groupby("k").nth([0, 1]).a.tolist(),
      lambda: M().groupby("k").nth([0, 1]).to_pandas().a.tolist())
probe("groupby.nth negative", lambda: P.groupby("k").nth(-1).a.tolist(),
      lambda: M().groupby("k").nth(-1).to_pandas().a.tolist())
probe("rolling.var ddof=0", lambda: P.a.rolling(3).var(ddof=0).fillna(-9).round(5).tolist(),
      lambda: M().a.rolling(3).var(ddof=0).to_pandas().fillna(-9).round(5).tolist())
probe("rolling.sem", lambda: P.a.rolling(3).sem().fillna(-9).round(5).tolist(),
      lambda: M().a.rolling(3).sem().to_pandas().fillna(-9).round(5).tolist())
probe("ewm halflife", lambda: P.a.ewm(halflife=2.0).mean().round(5).tolist(),
      lambda: M().a.ewm(halflife=2.0).mean().to_pandas().round(5).tolist())
probe("ewm adjust=False", lambda: P.a.ewm(alpha=0.3, adjust=False).mean().round(5).tolist(),
      lambda: M().a.ewm(alpha=0.3, adjust=False).mean().to_pandas().round(5).tolist())
probe("eval chained @var", lambda: (lambda lim=2: P.eval("c = a + @lim\nd = c * 2"))().d.tolist(),
      lambda: (lambda lim=2: M().eval("c = a + @lim\nd = c * 2"))().to_pandas().d.tolist())
probe("cut on negative values", lambda: pd.cut(pd.Series([-5, 0, 5]), 2, labels=False).tolist(),
      lambda: mpd.cut(mpd.from_pandas(pd.DataFrame({"x": [-5, 0, 5]})).x, 2, labels=False).to_pandas().tolist())
# FIXED late r11: the category SET rides the wrapper (_cat_meta) from
# setitem/assign, and groupby(observed=False) appends identity rows
# for unobserved categories (display order: observed-sorted + missing
# appended, vs pandas category-declaration order).
probe("categorical groupby unobserved", lambda: P.assign(c=pd.Categorical(P.k, categories=list("xyzw"))).groupby("c", observed=False)["a"].count().to_dict(),
      lambda: M().assign(c=pd.Categorical(P.k, categories=list("xyzw"))).groupby("c", observed=False)["a"].count().to_pandas().to_dict(),
      norm=lambda d: {str(k): v for k, v in d.items()})
probe("corrwith values", lambda: P[["a","b"]].corrwith(P[["a","b"]].fillna(0)).round(5).to_dict(),
      lambda: M()[["a","b"]].corrwith(M()[["a","b"]].fillna(0)).to_pandas().round(5).to_dict())
probe("series.str.len on lists skip", lambda: P.k.str.len().tolist(), lambda: M().k.str.len().to_pandas().tolist())
probe("series.nlargest dup keep=first", lambda: pd.Series([5, 5, 3]).nlargest(1).tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [5, 5, 3]})).x.nlargest(1).to_pandas().tolist())
probe("series.prod empty", lambda: float(pd.Series([], dtype="float64").prod()),
      lambda: float(mpd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype="float64")})).x.prod()))
probe("df.max mixed numeric_only", lambda: P.max(numeric_only=True).to_dict(),
      lambda: M().max(numeric_only=True).to_dict())
probe("series.idxmax on all-nan", lambda: pd.Series([np.nan, np.nan]).idxmax(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]})).x.idxmax(), norm=str)
probe("df.replace scalar pair", lambda: P.replace(3, 33).a.tolist(), lambda: M().replace(3, 33).to_pandas().a.tolist())
probe("df.replace list pair", lambda: P.replace([1, 2], [10, 20]).a.tolist(),
      lambda: M().replace([1, 2], [10, 20]).to_pandas().a.tolist())
probe("series.pipe", lambda: P.a.pipe(lambda s: s.sum()), lambda: M().a.pipe(lambda s: s.sum()))
probe("df.groupby sort=False order", lambda: P.groupby("k", sort=False)["a"].sum().index.tolist(),
      lambda: M().groupby("k", sort=False)["a"].sum().to_pandas().index.tolist())

print(f"\nTOTALS {results}")
