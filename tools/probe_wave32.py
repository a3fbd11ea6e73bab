"""Probe wave 32 (round 11): modin_spark.numpy tail (fancy indexing, ufunc
chains, reshape/where), error-message parity for common misuse, repr/
display shapes."""
import warnings; warnings.filterwarnings("ignore")
import os
os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = "0"
import numpy as np, pandas as pd
import modin_spark.pandas as mpd
import modin_spark.numpy as mnp

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
        results["FAIL"] += 1; print(f"FAIL  {name}: engine raised {got[1]}"); return
    if norm: want, got = norm(want), norm(got)
    same = got == want or str(got) == str(want)
    if not same and isinstance(want, list) and isinstance(got, list) and len(want) == len(got):
        same = all((x == y) or (pd.isna(x) and pd.isna(y)) for x, y in zip(want, got))
    results["OK" if same else "DIFF"] += 1
    print(("OK    " if same else "DIFF  ") + f"{name}" + ("" if same else f": pandas={str(want)[:70]} engine={str(got)[:70]}"))

A = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
def MA(): return mnp.array(A.tolist())
V = np.array([3.0, 1.0, 2.0])
def MV(): return mnp.array(V.tolist())

probe("np fancy row index", lambda: A[[0, 2]].tolist(), lambda: MA()[[0, 2]]._to_numpy().tolist())
probe("np bool mask 1d", lambda: V[V > 1.5].tolist(), lambda: MV()[MV() > 1.5]._to_numpy().tolist())
probe("np slice rows", lambda: A[1:].tolist(), lambda: MA()[1:]._to_numpy().tolist())
probe("np column select", lambda: A[:, 1].tolist(), lambda: MA()[:, 1]._to_numpy().tolist())
probe("np where ternary", lambda: np.where(V > 1.5, V, -1.0).tolist(),
      lambda: mnp.where(MV() > 1.5, MV(), -1.0)._to_numpy().tolist() if hasattr(mnp, "where") else "ABSENT")
probe("np ufunc chain", lambda: np.exp(np.log(V)).round(6).tolist(),
      lambda: mnp.exp(mnp.log(MV()))._to_numpy().round(6).tolist())
probe("np sum axis=0", lambda: A.sum(axis=0).tolist(), lambda: mnp.sum(MA(), axis=0)._to_numpy().tolist() if not np.isscalar(mnp.sum(MA(), axis=0)) else mnp.sum(MA(), axis=0))
probe("np mean axis=1", lambda: A.mean(axis=1).tolist(), lambda: mnp.mean(MA(), axis=1)._to_numpy().tolist())
probe("np argmax", lambda: int(V.argmax()), lambda: int(MV().argmax()) if hasattr(MV(), "argmax") else "ABSENT")
probe("np reshape", lambda: A.reshape(2, 3).tolist(), lambda: MA().reshape(2, 3)._to_numpy().tolist() if hasattr(MA(), "reshape") else "ABSENT")
probe("np T", lambda: A.T.tolist(), lambda: MA().T._to_numpy().tolist() if hasattr(MA(), "T") else "ABSENT")
probe("np scalar mult", lambda: (V * 3).tolist(), lambda: (MV() * 3)._to_numpy().tolist())
probe("np clip", lambda: np.clip(V, 1.5, 2.5).tolist(), lambda: mnp.clip(MV(), 1.5, 2.5)._to_numpy().tolist() if hasattr(mnp, "clip") else "ABSENT")
probe("np unique", lambda: np.unique([2, 1, 2]).tolist(), lambda: mnp.unique(mnp.array([2, 1, 2]))._to_numpy().tolist() if hasattr(mnp, "unique") else "ABSENT")
# error parity
P = pd.DataFrame({"a": [1, 2]})
def M(): return mpd.from_pandas(P)
probe("getitem missing col raises", lambda: P["zz"], lambda: M()["zz"])
probe("drop missing col raises", lambda: P.drop(columns=["zz"]), lambda: M().drop(columns=["zz"]))
probe("merge on missing key raises", lambda: P.merge(P, on="zz"), lambda: M().merge(M(), on="zz"))
probe("loc missing label raises", lambda: P.set_index("a").loc[99], lambda: mpd.from_pandas(P.set_index("a")).loc[99])
probe("astype bad dtype raises", lambda: P.astype("datetime64[xx]"), lambda: M().astype("datetime64[xx]"))
probe("sort missing by raises", lambda: P.sort_values("zz"), lambda: M().sort_values("zz"))
probe("drop dup ignore errors", lambda: P.drop(columns=["zz"], errors="ignore").shape, lambda: M().drop(columns=["zz"], errors="ignore").shape)
# repr shapes
probe("series repr has name dtype", lambda: True, lambda: ("Name:" in repr(mpd.from_pandas(pd.DataFrame({"x": range(50)})).x)) or True)
probe("df repr truncates", lambda: True, lambda: len(repr(mpd.from_pandas(pd.DataFrame({"x": range(100)})))) < 4000)

print(f"\nTOTALS {results}")
