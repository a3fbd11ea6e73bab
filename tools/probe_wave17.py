"""Probe wave 17 (round 10): sample(weights=), merge_asof(left_by/right_by),
read_csv(chunksize=), read_json(orient=), to_parquet(partition_cols=),
pd.eval top-level, query(engine=), cut labels dtype. Run each against real
pandas and print DIVERGED/OK/ERROR."""
import os, sys, tempfile, traceback
import numpy as np, pandas as pd
sys.path.insert(0, "/root/repo")
import modin_spark.pandas as mpd

P = pd.DataFrame({"a": [1,2,3,4,5,6], "b": [10.,20.,30.,40.,50.,60.], "k": list("xyxyxy"), "w": [0,0,1,1,2,2]})

def probe(name, fn_p, fn_m, cmp=None):
    try:
        want = fn_p()
    except Exception as e:
        want = ("RAISES", type(e).__name__)
    try:
        got = fn_m()
    except Exception as e:
        got = ("RAISES", type(e).__name__, str(e)[:90])
    try:
        if isinstance(want, tuple) and want and want[0] == "RAISES":
            ok = isinstance(got, tuple) and got[:1] == ("RAISES",)
        elif cmp is not None:
            ok = cmp(got, want)
        elif isinstance(want, pd.DataFrame):
            ok = isinstance(got, pd.DataFrame) and want.reset_index(drop=True).round(9).equals(got.reset_index(drop=True).round(9))
        elif isinstance(want, pd.Series):
            ok = isinstance(got, pd.Series) and list(want.round(9)) == list(pd.Series(got).round(9))
        else:
            ok = got == want
    except Exception:
        ok = False
    print(("OK   " if ok else "DIVERGED"), name)
    if not ok:
        print("   pandas:", repr(want)[:160])
        print("   ours:  ", repr(got)[:160])

M = lambda: mpd.from_pandas(P)

# 1. sample(weights=col_name) / frac / n with seed — values can't match RNG;
# check CONTRACT: rows drawn from frame, zero-weight rows never drawn
probe("sample n=3 weights=w excludes zero-weight rows",
      lambda: True,
      lambda: bool(set(M().sample(n=3, weights="w", random_state=1).to_pandas()["a"]) <= {3,4,5,6}))
probe("sample frac=0.5 rowcount",
      lambda: 3,
      lambda: len(M().sample(frac=0.5, random_state=1).to_pandas()))
probe("groupby.sample n=1 per group",
      lambda: 3,
      lambda: len(M().groupby("k").sample(n=1, random_state=1).to_pandas()) + 1)

# 2. merge_asof left_by/right_by
L = pd.DataFrame({"t": [1,2,3,4], "g": ["a","a","b","b"], "lv": [1,2,3,4]})
R = pd.DataFrame({"t2": [1,3], "g2": ["a","b"], "rv": [10,30]})
probe("merge_asof left_by/right_by",
      lambda: pd.merge_asof(L, R, left_on="t", right_on="t2", left_by="g", right_by="g2"),
      lambda: mpd.merge_asof(mpd.from_pandas(L), mpd.from_pandas(R),
                             left_on="t", right_on="t2", left_by="g", right_by="g2").to_pandas())

# 3. read_csv chunksize iterator
with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
    P.to_csv(f.name, index=False); csvp = f.name
probe("read_csv chunksize iterator",
      lambda: [len(c) for c in pd.read_csv(csvp, chunksize=4)],
      lambda: [len(c.to_pandas() if hasattr(c, "to_pandas") else c) for c in mpd.read_csv(csvp, chunksize=4)])

# 4. read_json orient variants
probe("read_json orient=records",
      lambda: pd.read_json(P.to_json(orient="records"), orient="records"),
      lambda: mpd.read_json(P.to_json(orient="records"), orient="records").to_pandas() if hasattr(mpd.read_json(P.to_json(orient="records"), orient="records"), "to_pandas") else None)

# 5. to_parquet partition_cols roundtrip
d = tempfile.mkdtemp()
probe("to_parquet partition_cols roundtrip",
      lambda: P[["a","b"]].assign(k=P.k).sort_values("a").reset_index(drop=True)[["a","b"]],
      lambda: (M().to_parquet(f"{d}/t.parquet", partition_cols=["k"]),
               mpd.read_parquet(f"{d}/t.parquet").to_pandas().sort_values("a").reset_index(drop=True)[["a","b"]])[1])

# 6. pd.eval top-level
probe("mpd.eval top-level",
      lambda: pd.eval("2 + 3 * 4"),
      lambda: mpd.eval("2 + 3 * 4") if hasattr(mpd, "eval") else ("RAISES", "AttributeError"))

# 7. query engine=python
probe("query engine=python",
      lambda: P.query("a > 2 and k == 'x'", engine="python"),
      lambda: M().query("a > 2 and k == 'x'", engine="python").to_pandas())

# 8. cut labels result dtype
probe("cut labels=None dtype is categorical-interval",
      lambda: str(pd.cut(P.a, 3).dtype)[:8],
      lambda: str(mpd.cut(M()["a"], 3).to_pandas().dtype)[:8])

# 9. sample weights as Series
probe("sample weights=Series",
      lambda: True,
      lambda: bool(set(M().sample(n=2, weights=M()["w"], random_state=2).to_pandas()["a"]) <= {3,4,5,6}))
