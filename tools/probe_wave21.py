"""Probe wave 21 (round 11): MultiIndex/categorical/str/replace/explode/
resample tails + merge kwargs. Prints OK/DIFF/FAIL per case."""
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
                  "s": ["a-b", "c-d-e", None, "f", "g-h"],
                  "t": pd.date_range("2024-01-01", periods=5, freq="45min")})
def M(): return mpd.from_pandas(P)
PMI = P.set_index(["k", "g"])
def MMI(): return mpd.from_pandas(PMI)

# --- MultiIndex tails
probe("groupby level=0", lambda: PMI.groupby(level=0)["a"].sum().to_dict(),
      lambda: MMI().groupby(level=0)["a"].sum().to_pandas().to_dict())
probe("groupby level name", lambda: PMI.groupby(level="g")["a"].sum().to_dict(),
      lambda: MMI().groupby(level="g")["a"].sum().to_pandas().to_dict())
probe("xs level=1", lambda: PMI.xs("m", level=1)["a"].tolist(),
      lambda: MMI().xs("m", level=1).to_pandas()["a"].tolist())
probe("droplevel", lambda: list(PMI.droplevel(0).index), lambda: list(MMI().droplevel(0).to_pandas().index))
probe("rename_axis", lambda: PMI.rename_axis(["K", "G"]).index.names,
      lambda: MMI().rename_axis(["K", "G"]).to_pandas().index.names, norm=list)
probe("reorder_levels", lambda: [tuple(x) for x in PMI.reorder_levels([1, 0]).index],
      lambda: [tuple(x) for x in MMI().reorder_levels([1, 0]).to_pandas().index])
probe("unstack level=0", lambda: PMI["a"].unstack(level=0).fillna(-1).values.tolist(),
      lambda: MMI()["a"].unstack(level=0).to_pandas().fillna(-1).values.tolist())
# --- categorical
probe("astype category codes", lambda: P.k.astype("category").cat.codes.tolist(),
      lambda: M().k.astype("category").cat.codes.to_pandas().tolist())
probe("cat.categories", lambda: list(P.k.astype("category").cat.categories),
      lambda: list(M().k.astype("category").cat.categories))
probe("cat.rename_categories", lambda: P.k.astype("category").cat.rename_categories({"x": "X"}).tolist(),
      lambda: M().k.astype("category").cat.rename_categories({"x": "X"}).to_pandas().tolist())
# --- str tails
probe("str.rsplit n=1", lambda: P.s.str.rsplit("-", n=1).tolist(),
      lambda: M().s.str.rsplit("-", n=1).to_pandas().tolist(),
      norm=lambda x: [list(v) if isinstance(v, (list, np.ndarray)) else v for v in x])
probe("str.removeprefix", lambda: P.s.str.removeprefix("a-").tolist(),
      lambda: M().s.str.removeprefix("a-").to_pandas().tolist())
probe("str.slice_replace", lambda: P.s.str.slice_replace(1, 3, "_").tolist(),
      lambda: M().s.str.slice_replace(1, 3, "_").to_pandas().tolist())
probe("str.zfill", lambda: P.s.str.zfill(6).tolist(), lambda: M().s.str.zfill(6).to_pandas().tolist())
probe("str.casefold", lambda: P.s.str.casefold().tolist(), lambda: M().s.str.casefold().to_pandas().tolist())
probe("str.get", lambda: P.s.str.get(1).tolist(), lambda: M().s.str.get(1).to_pandas().tolist())
probe("str.split expand", lambda: P.s.str.split("-", expand=True).fillna("").values.tolist(),
      lambda: M().s.str.split("-", expand=True).to_pandas().fillna("").values.tolist())
# --- replace / fillna
probe("replace dict-of-dict", lambda: P.replace({"k": {"x": "XX"}}).k.tolist(),
      lambda: M().replace({"k": {"x": "XX"}}).to_pandas().k.tolist())
probe("fillna dict", lambda: P.fillna({"b": 0.0}).b.tolist(),
      lambda: M().fillna({"b": 0.0}).to_pandas().b.tolist())
probe("ffill limit", lambda: pd.DataFrame({"x": [1.0, None, None, 2.0]}).ffill(limit=1).x.fillna(-9).tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [1.0, None, None, 2.0]})).ffill(limit=1).to_pandas().x.fillna(-9).tolist())
probe("replace regex str", lambda: P.s.replace(r"^a.*", "A", regex=True).tolist(),
      lambda: M().s.replace(r"^a.*", "A", regex=True).to_pandas().tolist())
# --- explode / stack variants
probe("explode two cols", lambda: P.assign(l1=[[1,2],[3],[4],[5],[6]], l2=[[7,8],[9],[10],[11],[12]]).explode(["l1","l2"]).l2.tolist(),
      lambda: M().assign(l1=[[1,2],[3],[4],[5],[6]], l2=[[7,8],[9],[10],[11],[12]]).explode(["l1","l2"]).to_pandas().l2.tolist())
probe("explode ignore_index", lambda: list(P.assign(l=[[1,2],[3],[],[5],[6]]).explode("l", ignore_index=True).index),
      lambda: list(M().assign(l=[[1,2],[3],[],[5],[6]]).explode("l", ignore_index=True).to_pandas().index))
# --- map/apply
probe("series.map dict", lambda: P.k.map({"x": 1, "y": 2}).tolist(),
      lambda: M().k.map({"x": 1, "y": 2}).to_pandas().tolist())
probe("series.map na_action", lambda: P.s.map(lambda v: v.upper(), na_action="ignore").tolist(),
      lambda: M().s.map(lambda v: v.upper(), na_action="ignore").to_pandas().tolist())
probe("df.transform list", lambda: P[["a"]].transform(["abs"]).values.tolist(),
      lambda: M()[["a"]].transform(["abs"]).to_pandas().values.tolist())
# --- resample tails
probe("resample ohlc", lambda: P.set_index("t").resample("1h")["a"].ohlc().fillna(-1).values.tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).resample("1h")["a"].ohlc().to_pandas().fillna(-1).values.tolist())
probe("resample origin=start", lambda: P.set_index("t").resample("50min", origin="start")["a"].sum().tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).resample("50min", origin="start")["a"].sum().to_pandas().tolist())
probe("resample count", lambda: P.set_index("t").resample("1h")["a"].count().tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).resample("1h")["a"].count().to_pandas().tolist())
# --- merge kwargs
probe("merge indicator", lambda: P[["a","k"]].merge(P[["a","b"]].head(3), on="a", how="outer", indicator=True)._merge.astype(str).sorted_or(list) if False else sorted(P[["a","k"]].merge(P[["a","b"]].head(3), on="a", how="outer", indicator=True)["_merge"].astype(str).tolist()),
      lambda: sorted(M()[["a","k"]].merge(M()[["a","b"]].head(3), on="a", how="outer", indicator=True).to_pandas()["_merge"].astype(str).tolist()))
probe("merge validate 1:1", lambda: P[["a","k"]].merge(P[["a","b"]], on="a", validate="1:1").shape,
      lambda: M()[["a","k"]].merge(M()[["a","b"]], on="a", validate="1:1").shape)
probe("merge cross", lambda: P[["a"]].head(2).merge(P[["b"]].head(2), how="cross").shape,
      lambda: M()[["a"]].head(2).merge(M()[["b"]].head(2), how="cross").shape)
# --- misc
probe("to_timedelta", lambda: pd.to_timedelta(pd.Series(["1 days", "2 days"])).dt.days.tolist(),
      lambda: mpd.to_timedelta(mpd.from_pandas(pd.DataFrame({"x": ["1 days", "2 days"]})).x).dt.days.to_pandas().tolist())
probe("between_time", lambda: P.set_index("t").between_time("00:30", "02:00").a.tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).between_time("00:30", "02:00").to_pandas().a.tolist())
probe("infer_objects", lambda: str(pd.DataFrame({"x": np.array([1, 2], dtype=object)}).infer_objects().x.dtype),
      lambda: str(mpd.from_pandas(pd.DataFrame({"x": np.array([1, 2], dtype=object)})).infer_objects().to_pandas().x.dtype))
probe("df.pipe", lambda: P.pipe(lambda d: d.a.sum()), lambda: M().pipe(lambda d: d.a.sum()))
probe("series.round even", lambda: pd.Series([0.5, 1.5, 2.5]).round().tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": [0.5, 1.5, 2.5]})).x.round().to_pandas().tolist())
probe("df.eval multiline", lambda: P.eval("c = a * 2\nd = c + 1").d.tolist(),
      lambda: M().eval("c = a * 2\nd = c + 1").to_pandas().d.tolist())
probe("series.where callable", lambda: P.a.where(lambda v: v > 2, -1).tolist(),
      lambda: M().a.where(lambda v: v > 2, -1).to_pandas().tolist())
probe("df.take", lambda: P.take([0, 3]).a.tolist(), lambda: M().take([0, 3]).to_pandas().a.tolist())
probe("series.repeat", lambda: P.a.repeat(2).tolist(), lambda: M().a.repeat(2).to_pandas().tolist())
probe("df.add_prefix", lambda: list(P.add_prefix("p_").columns), lambda: list(M().add_prefix("p_").columns))
probe("series.astype Int64 roundtrip", lambda: pd.Series([1, None]).astype("Int64").isna().tolist(),
      lambda: mpd.from_pandas(pd.DataFrame({"x": pd.Series([1, None], dtype="Int64")})).x.isna().to_pandas().tolist())

print(f"\nTOTALS {results}")
