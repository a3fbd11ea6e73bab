"""Probe wave 20 (round 11): differential sweep over still-unswept surface —
axis-metadata setters, at/iat writes, groupby window/shift tails, str/dt
accessor tails, cut/qcut kwargs, rank pct, merge_ordered fill, mode axis=1,
pivot_table margins with multi-agg. Prints OK/DIFF/FAIL per case."""
import warnings; warnings.filterwarnings("ignore")
import os, traceback
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
            results["DIFF"] += 1; print(f"DIFF  {name}: pandas={str(want)[:90]} engine={str(got)[:90]}")
    except Exception as e:
        results["FAIL"] += 1
        print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:110]}")

P = pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5],
                  "k": list("xyxyx"), "t": pd.date_range("2024-03-30", periods=5, freq="12h"),
                  "s": ["Alpha Beta", "gamma", "DELTA delta", "ep'si", None]})
def M():
    return mpd.from_pandas(P)

# --- axis metadata setters
probe("df.columns setter", lambda: list(P.rename(columns=dict(zip(P.columns, "ABCDE"))).columns),
      lambda: (lambda m: (setattr(m, "columns", list("ABCDE")), list(m.columns))[1])(M()))
probe("df.index setter", lambda: list(P.set_axis([10,20,30,40,50]).index),
      lambda: (lambda m: (setattr(m, "index", [10,20,30,40,50]), list(m.to_pandas().index))[1])(M()))
# --- at/iat
probe("df.at read", lambda: P.at[2, "a"], lambda: M().at[2, "a"])
probe("df.iat read", lambda: P.iat[3, 0], lambda: M().iat[3, 0])
probe("df.at write", lambda: (lambda p: (p.__setitem__, p)[1])(P.copy()).pipe(lambda p: (p.at.__setitem__((2,"a"), 99), p.a.tolist())[1]),
      lambda: (lambda m: (m.at.__setitem__((2,"a"), 99), m.to_pandas().a.tolist())[1])(M()))
probe("df.iat write", lambda: (lambda p: (p.iat.__setitem__((1,0), 42), p.a.tolist())[1])(P.copy()),
      lambda: (lambda m: (m.iat.__setitem__((1,0), 42), m.to_pandas().a.tolist())[1])(M()))
# --- groupby tails
probe("groupby.shift fill_value", lambda: P.groupby("k")["a"].shift(1, fill_value=-1).tolist(),
      lambda: M().groupby("k")["a"].shift(1, fill_value=-1).to_pandas().tolist())
probe("groupby.diff", lambda: P.groupby("k")["a"].diff().tolist(),
      lambda: M().groupby("k")["a"].diff().to_pandas().tolist())
probe("groupby.expanding min_periods", lambda: P.groupby("k")["a"].expanding(min_periods=2).sum().tolist(),
      lambda: M().groupby("k")["a"].expanding(min_periods=2).sum().to_pandas().tolist())
probe("groupby.cummax", lambda: P.groupby("k")["a"].cummax().tolist(),
      lambda: M().groupby("k")["a"].cummax().to_pandas().tolist())
probe("groupby.rank pct", lambda: P.groupby("k")["a"].rank(pct=True).tolist(),
      lambda: M().groupby("k")["a"].rank(pct=True).to_pandas().tolist())
# --- str tail
probe("str.findall", lambda: P.s.str.findall(r"[a-z]+").tolist(),
      lambda: M().s.str.findall(r"[a-z]+").to_pandas().tolist(), norm=lambda x: [list(v) if isinstance(v, (list, np.ndarray)) else v for v in x])
probe("str.extract", lambda: P.s.str.extract(r"^(\w+)")[0].tolist(),
      lambda: M().s.str.extract(r"^(\w+)")[0].to_pandas().tolist())
probe("str.partition", lambda: P.s.str.partition(" ")[0].tolist(),
      lambda: M().s.str.partition(" ")[0].to_pandas().tolist())
probe("str.normalize", lambda: P.s.str.normalize("NFC").tolist(),
      lambda: M().s.str.normalize("NFC").to_pandas().tolist())
probe("str.wrap", lambda: P.s.str.wrap(5).tolist(),
      lambda: M().s.str.wrap(5).to_pandas().tolist())
probe("str.translate", lambda: P.s.str.translate(str.maketrans("a", "o")).tolist(),
      lambda: M().s.str.translate(str.maketrans("a", "o")).to_pandas().tolist())
# --- dt tail
probe("dt.isocalendar week", lambda: P.t.dt.isocalendar().week.tolist(),
      lambda: M().t.dt.isocalendar().week.to_pandas().tolist())
probe("dt.days_in_month", lambda: P.t.dt.days_in_month.tolist(),
      lambda: M().t.dt.days_in_month.to_pandas().tolist())
probe("dt.is_quarter_end", lambda: P.t.dt.is_quarter_end.tolist(),
      lambda: M().t.dt.is_quarter_end.to_pandas().tolist())
probe("dt.to_period M", lambda: P.t.dt.to_period("M").astype(str).tolist(),
      lambda: M().t.dt.to_period("M").astype(str).to_pandas().tolist())
# --- cut/qcut kwargs
probe("cut labels=False", lambda: pd.cut(P.a, 2, labels=False).tolist(),
      lambda: mpd.cut(M().a, 2, labels=False).to_pandas().tolist())
probe("cut retbins", lambda: pd.cut(P.a, 2, retbins=True)[1].round(4).tolist(),
      lambda: (lambda r: np.round(r[1], 4).tolist())(mpd.cut(M().a, 2, retbins=True)))
probe("qcut duplicates=drop", lambda: pd.qcut(pd.Series([1,1,1,2]), 4, duplicates="drop", labels=False).tolist(),
      lambda: mpd.qcut(mpd.from_pandas(pd.DataFrame({"x":[1,1,1,2]})).x, 4, duplicates="drop", labels=False).to_pandas().tolist())
# --- rank/mode/nlargest
probe("rank pct", lambda: P.a.rank(pct=True).tolist(), lambda: M().a.rank(pct=True).to_pandas().tolist())
probe("mode axis=1", lambda: P[["a"]].assign(c=P.a).mode(axis=1)[0].tolist(),
      lambda: M()[["a"]].assign(c=M().a).mode(axis=1)[0].to_pandas().tolist())
probe("nlargest keep=all", lambda: P.a.nlargest(2, keep="all").tolist(),
      lambda: M().a.nlargest(2, keep="all").to_pandas().tolist())
probe("df.nlargest columns", lambda: P.nlargest(2, "a").a.tolist(),
      lambda: M().nlargest(2, "a").to_pandas().a.tolist())
# --- merge_ordered / combine_first
probe("merge_ordered ffill", lambda: pd.merge_ordered(P[["a","k"]], P[["a","b"]], on="a", fill_method="ffill").b.tolist(),
      lambda: mpd.merge_ordered(M()[["a","k"]], M()[["a","b"]], on="a", fill_method="ffill").to_pandas().b.tolist())
probe("combine_first", lambda: P[["b"]].combine_first(P[["b"]].fillna(9)).b.tolist(),
      lambda: M()[["b"]].combine_first(M()[["b"]].fillna(9)).to_pandas().b.tolist())
# --- pivot_table margins multi-agg
probe("pivot_table margins multiagg",
      lambda: pd.pivot_table(P, values="a", index="k", aggfunc=["sum", "mean"], margins=True).values.round(3).tolist(),
      lambda: mpd.pivot_table(M(), values="a", index="k", aggfunc=["sum", "mean"], margins=True).to_pandas().values.round(3).tolist())
# --- misc
probe("df.squeeze cols", lambda: P[["a"]].squeeze().tolist(), lambda: M()[["a"]].squeeze().to_pandas().tolist())
probe("df.duplicated keep=last", lambda: P.assign(a=[1,1,2,2,3]).duplicated(subset=["a"], keep="last").tolist(),
      lambda: M().assign(a=[1,1,2,2,3]).duplicated(subset=["a"], keep="last").to_pandas().tolist())
probe("series.between inclusive=neither", lambda: P.a.between(1, 4, inclusive="neither").tolist(),
      lambda: M().a.between(1, 4, inclusive="neither").to_pandas().tolist())
probe("df.idxmax axis=1", lambda: P[["a","b"]].idxmax(axis=1).tolist(),
      lambda: M()[["a","b"]].idxmax(axis=1).to_pandas().tolist())
probe("series.autocorr", lambda: round(P.a.autocorr(1), 6), lambda: round(M().a.autocorr(1), 6))
probe("df.cumprod", lambda: P[["a"]].cumprod().a.tolist(), lambda: M()[["a"]].cumprod().to_pandas().a.tolist())
probe("series.searchsorted", lambda: int(P.a.sort_values().searchsorted(3)),
      lambda: int(M().a.sort_values().searchsorted(3)))
probe("df.agg dict mixed", lambda: P.agg({"a": "sum", "b": "mean"}).round(4).tolist(),
      lambda: M().agg({"a": "sum", "b": "mean"}).round(4).tolist())  # engine agg(dict) returns a driver pandas Series, like pandas
probe("series.clip bounds series", lambda: P.a.clip(lower=pd.Series([0,2,2,2,5])).tolist(),
      lambda: M().a.clip(lower=mpd.from_pandas(pd.DataFrame({"x":[0,2,2,2,5]})).x).to_pandas().tolist())
probe("df.where other=df", lambda: P[["a"]].where(P[["a"]] > 2, -P[["a"]]).a.tolist(),
      lambda: M()[["a"]].where(M()[["a"]] > 2, -M()[["a"]]).to_pandas().a.tolist())
probe("first_valid_index", lambda: P.b.first_valid_index(), lambda: M().b.first_valid_index())
probe("last_valid_index", lambda: P.b.last_valid_index(), lambda: M().b.last_valid_index())
probe("df.lookup-style stack", lambda: P[["a","b"]].stack().round(3).tolist(),
      lambda: M()[["a","b"]].stack().to_pandas().round(3).tolist())

print(f"\nTOTALS {results}")
