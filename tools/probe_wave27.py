"""Probe wave 27 (round 11): groupby filtrations/apply shapes, resample
groups, MultiIndex selection, str methods with regex groups, datetime index
ops, df numeric edge semantics."""
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
                  "s": ["a1b2", "c33", None, "d4", "e5f6"],
                  "t": pd.date_range("2024-01-01", periods=5, freq="D")})
def M(): return mpd.from_pandas(P)

# groupby shapes
probe("groupby.filter", lambda: P.groupby("k").filter(lambda d: d.a.sum() > 6).a.tolist(),
      lambda: M().groupby("k").filter(lambda d: d.a.sum() > 6).to_pandas().a.tolist())
probe("groupby.apply frame->frame", lambda: P.groupby("k")[["a"]].apply(lambda d: d - d.mean()).a.round(4).tolist(),
      lambda: M().groupby("k")[["a"]].apply(lambda d: d - d.mean()).to_pandas().a.round(4).tolist())
probe("groupby.apply scalar", lambda: P.groupby("k")["a"].apply(lambda s: s.max() - s.min()).to_dict(),
      lambda: M().groupby("k")["a"].apply(lambda s: s.max() - s.min()).to_pandas().to_dict())
probe("groupby.nth", lambda: P.groupby("k").nth(1).a.tolist(),
      lambda: M().groupby("k").nth(1).to_pandas().a.tolist())
probe("groupby.get_group", lambda: P.groupby("k").get_group("x").a.tolist(),
      lambda: M().groupby("k").get_group("x").to_pandas().a.tolist())
probe("groupby.agg lambda on two cols dict", lambda: P.groupby("k").agg({"a": lambda s: s.max(), "b": "sum"}).fillna(-9).values.round(3).tolist(),
      lambda: M().groupby("k").agg({"a": lambda s: s.max(), "b": "sum"}).to_pandas().fillna(-9).values.round(3).tolist())
# str regex groups
probe("str.extract two groups", lambda: pd.Series(P.s).str.extract(r"([a-z])(\d)").fillna("-").values.tolist(),
      lambda: M().s.str.extract(r"([a-z])(\d)").to_pandas().fillna("-").values.tolist())
probe("str.count regex", lambda: P.s.str.count(r"\d").fillna(-1).tolist(),
      lambda: M().s.str.count(r"\d").to_pandas().fillna(-1).tolist())
probe("str.contains regex na=False", lambda: P.s.str.contains(r"\d\d", na=False).tolist(),
      lambda: M().s.str.contains(r"\d\d", na=False).to_pandas().tolist())
probe("str.match", lambda: P.s.str.match(r"[ace]").fillna(False).tolist(),
      lambda: M().s.str.match(r"[ace]").to_pandas().fillna(False).tolist())
probe("str.fullmatch", lambda: P.s.str.fullmatch(r"\w\d\w\d").fillna(False).tolist(),
      lambda: M().s.str.fullmatch(r"\w\d\w\d").to_pandas().fillna(False).tolist())
probe("str.replace callable", lambda: P.s.str.replace(r"\d", lambda m: "#", regex=True).tolist(),
      lambda: M().s.str.replace(r"\d", lambda m: "#", regex=True).to_pandas().tolist())
# datetime index ops
probe("idx shift freq", lambda: P.set_index("t").shift(1, freq="D").index.astype(str).tolist(),
      lambda: mpd.from_pandas(P.set_index("t")).shift(1, freq="D").to_pandas().index.astype(str).tolist())
probe("resample label=right", lambda: P.set_index("t").resample("2D", label="right")["a"].sum().to_dict(),
      lambda: mpd.from_pandas(P.set_index("t")).resample("2D", label="right")["a"].sum().to_pandas().to_dict(),
      norm=lambda d: {str(k): v for k, v in d.items()})
probe("resample closed=right", lambda: P.set_index("t").resample("2D", closed="right")["a"].sum().to_dict(),
      lambda: mpd.from_pandas(P.set_index("t")).resample("2D", closed="right")["a"].sum().to_pandas().to_dict(),
      norm=lambda d: {str(k): v for k, v in d.items()})
# MultiIndex selection
PMI = P.set_index(["k", "g"]).sort_index()
probe("loc tuple partial", lambda: PMI.loc[("x",)].a.tolist(),
      lambda: mpd.from_pandas(PMI).loc[("x",)].to_pandas().a.tolist())
probe("loc list of tuples", lambda: PMI.loc[[("x", "m")]].a.tolist(),
      lambda: mpd.from_pandas(PMI).loc[[("x", "m")]].to_pandas().a.tolist())
probe("mi groupby level sum both", lambda: PMI.groupby(level=["k", "g"]).a.sum().to_dict(),
      lambda: mpd.from_pandas(PMI).groupby(level=["k", "g"]).a.sum().to_pandas().to_dict(),
      norm=lambda d: {tuple(map(str, k)): v for k, v in d.items()})
# numeric edges
probe("int div by zero", lambda: (P.a / 0).tolist(), lambda: (M().a / 0).to_pandas().tolist(), norm=str)
probe("mod negative", lambda: (P.a % -3).tolist(), lambda: (M().a % -3).to_pandas().tolist())
probe("floordiv negative", lambda: (P.a // -2).tolist(), lambda: (M().a // -2).to_pandas().tolist())
probe("pow fractional", lambda: (P.a ** 0.5).round(6).tolist(), lambda: (M().a ** 0.5).round(6).to_pandas().tolist())
probe("abs on frame", lambda: (-P[["a"]]).abs().a.tolist(), lambda: (-M()[["a"]]).abs().to_pandas().a.tolist())
probe("series floor mod float", lambda: (P.b % 1.0).fillna(-9).round(4).tolist(),
      lambda: (M().b % 1.0).to_pandas().fillna(-9).round(4).tolist())
probe("clip both bounds", lambda: P.a.clip(2, 4).tolist(), lambda: M().a.clip(2, 4).to_pandas().tolist())
probe("cummin", lambda: P.a.cummin().tolist(), lambda: M().a.cummin().to_pandas().tolist())
probe("round negative decimals", lambda: (P.a * 111).round(-2).tolist(), lambda: (M().a * 111).round(-2).to_pandas().tolist())

print(f"\nTOTALS {results}")
