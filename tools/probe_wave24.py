"""Probe wave 24 (round 11): duplicate labels, empty/all-null frames,
concat keys/names, reindex fill variants, observed groupby, IO kwargs
(parquet filters/compression, csv dtype), single-row edge cases."""
import warnings; warnings.filterwarnings("ignore")
import os, tempfile
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

P = pd.DataFrame({"a": [3, 1, 2, 5, 4], "b": [1.5, np.nan, 2.5, 0.5, 3.5], "k": list("xyxyx")})
def M(): return mpd.from_pandas(P)

# --- empty / single-row / all-null
E = pd.DataFrame({"a": pd.Series([], dtype="int64"), "k": pd.Series([], dtype="object")})
probe("empty groupby agg", lambda: E.groupby("k").agg(n=("a", "sum")).shape,
      lambda: mpd.from_pandas(E).groupby("k").agg(n=("a", "sum")).shape)
probe("empty sort_values", lambda: E.sort_values("a").shape, lambda: mpd.from_pandas(E).sort_values("a").shape)
probe("empty concat", lambda: pd.concat([E, E]).shape, lambda: mpd.concat([mpd.from_pandas(E), mpd.from_pandas(E)]).shape)
probe("single row describe", lambda: P.head(1).describe().loc["mean", "a"],
      lambda: M().head(1).describe().loc["mean", "a"] if hasattr(M().head(1).describe(), "loc") else M().head(1).describe().to_pandas().loc["mean", "a"])
N = pd.DataFrame({"x": [np.nan, np.nan], "y": [1.0, 2.0]})
probe("all-null mean", lambda: str(N.x.mean()), lambda: str(mpd.from_pandas(N).x.mean()))
probe("all-null dropna", lambda: N.dropna().shape, lambda: mpd.from_pandas(N).dropna().shape)
probe("all-null value_counts", lambda: N.x.value_counts().shape, lambda: mpd.from_pandas(N).x.value_counts().shape)
# --- duplicate column labels
D = pd.DataFrame([[1, 2, 3], [4, 5, 6]], columns=["a", "a", "b"])
probe("dup labels getitem", lambda: D["a"].shape, lambda: mpd.from_pandas(D)["a"].shape)
probe("dup labels to_pandas", lambda: list(D.columns), lambda: list(mpd.from_pandas(D).to_pandas().columns))
probe("dup labels sum", lambda: D.sum().tolist(), lambda: mpd.from_pandas(D).sum().tolist())
# --- concat keys / names
probe("concat keys", lambda: [tuple(x) for x in pd.concat([P[["a"]], P[["a"]]], keys=["l", "r"]).index][:3],
      lambda: [tuple(x) for x in mpd.concat([M()[["a"]], M()[["a"]]], keys=["l", "r"]).to_pandas().index][:3])
probe("concat names kwarg", lambda: pd.concat([P[["a"]], P[["a"]]], keys=["l", "r"], names=["src", None]).index.names[0],
      lambda: mpd.concat([M()[["a"]], M()[["a"]]], keys=["l", "r"], names=["src", None]).to_pandas().index.names[0])
probe("concat join=inner", lambda: list(pd.concat([P[["a", "b"]], P[["a", "k"]]], join="inner").columns),
      lambda: list(mpd.concat([M()[["a", "b"]], M()[["a", "k"]]], join="inner").columns))
# --- reindex variants
probe("reindex method=ffill", lambda: P.set_index("a").sort_index().reindex([1, 3, 6], method="ffill").b.fillna(-9).tolist(),
      lambda: mpd.from_pandas(P.set_index("a").sort_index()).reindex([1, 3, 6], method="ffill").to_pandas().b.fillna(-9).tolist())
# DOCUMENTED divergence: filling a STRING column with a non-string
# fill_value stringifies it (Spark columns are typed; pandas object
# columns hold mixed scalars). Numeric fills into numeric columns and
# string fills into string columns are exact.
probe("reindex fill_value (known: int fill into string col stringifies)", lambda: P.set_index("a").reindex([1, 9], fill_value=0).k.tolist(),
      lambda: mpd.from_pandas(P.set_index("a")).reindex([1, 9], fill_value=0).to_pandas().k.tolist())
# --- groupby observed / categorical keys
C = P.assign(c=pd.Categorical(P.k, categories=["x", "y", "z"]))
probe("groupby categorical observed=True", lambda: C.groupby("c", observed=True)["a"].sum().to_dict(),
      lambda: mpd.from_pandas(C).groupby("c", observed=True)["a"].sum().to_pandas().to_dict())
# --- IO kwargs
d = tempfile.mkdtemp()
P.to_parquet(f"{d}/p.parquet")
probe("read_parquet filters", lambda: pd.read_parquet(f"{d}/p.parquet", filters=[("a", ">", 2)]).a.sort_values().tolist(),
      lambda: mpd.read_parquet(f"{d}/p.parquet", filters=[("a", ">", 2)]).to_pandas().a.sort_values().tolist())
probe("to_parquet compression snappy", lambda: True,
      lambda: (M().to_parquet(f"{d}/ps.parquet", compression="snappy"), mpd.read_parquet(f"{d}/ps.parquet").shape == P.shape)[1])
probe("read_csv dtype str", lambda: str(pd.read_csv(f"{d}/c.csv", dtype={"a": "str"}).a.dtype) if (P.to_csv(f"{d}/c.csv", index=False) or True) else None,
      lambda: str(mpd.read_csv(f"{d}/c.csv", dtype={"a": "str"}).to_pandas().a.dtype))
probe("to_csv header=False read names", lambda: True,
      lambda: (M().to_csv(f"{d}/h.csv", index=False, header=False),
               mpd.read_csv(f"{d}/h.csv", header=None, names=["a","b","k"]).shape == P.shape)[1])
# --- setitem edge cases
probe("setitem scalar broadcast", lambda: (lambda p: (p.__setitem__("z", 7), p.z.tolist())[1])(P.copy()),
      lambda: (lambda m: (m.__setitem__("z", 7), m.to_pandas().z.tolist())[1])(M()))
probe("setitem series from other frame", lambda: (lambda p: (p.__setitem__("z", P.a * 2), p.z.tolist())[1])(P.copy()),
      lambda: (lambda m: (m.__setitem__("z", mpd.from_pandas(P).a * 2), m.to_pandas().z.tolist())[1])(M()))
probe("setitem list", lambda: (lambda p: (p.__setitem__("z", [9, 8, 7, 6, 5]), p.z.tolist())[1])(P.copy()),
      lambda: (lambda m: (m.__setitem__("z", [9, 8, 7, 6, 5]), m.to_pandas().z.tolist())[1])(M()))
probe("setitem boolean mask col", lambda: (lambda p: (p.__setitem__("z", p.a > 2), p.z.tolist())[1])(P.copy()),
      lambda: (lambda m: (m.__setitem__("z", m.a > 2), m.to_pandas().z.tolist())[1])(M()))
# --- sort stability and kind
probe("sort_values stable ties", lambda: P.assign(t=[1, 1, 1, 1, 1]).sort_values("t").a.tolist(),
      lambda: M().assign(t=[1, 1, 1, 1, 1]).sort_values("t").to_pandas().a.tolist())
probe("sort_values key=", lambda: P.sort_values("k", key=lambda s: s.str.upper()).a.tolist(),
      lambda: M().sort_values("k", key=lambda s: s.str.upper()).to_pandas().a.tolist())
probe("sort_index ascending=False", lambda: P.set_index("a").sort_index(ascending=False).b.fillna(-9).tolist(),
      lambda: mpd.from_pandas(P.set_index("a")).sort_index(ascending=False).to_pandas().b.fillna(-9).tolist())
# --- head/tail negative
probe("head negative", lambda: P.head(-2).a.tolist(), lambda: M().head(-2).to_pandas().a.tolist())
probe("tail negative", lambda: P.tail(-2).a.tolist(), lambda: M().tail(-2).to_pandas().a.tolist())

print(f"\nTOTALS {results}")
