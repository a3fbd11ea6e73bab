"""Probe wave 44 (r14): writer round trips (to_csv/parquet/json), tz
localize/convert chains, rolling/expanding .apply, groupby.apply shapes,
df.compare/combine, rename_axis/set_axis/droplevel(axis=1), astype errors=,
convert_dtypes/infer_objects, select_dtypes, at/iat reads, numpy veneer
ops, period arithmetic, interval containment, Series.pop/update chains.

Usage: python tools/probe_wave44.py [--verbose]
"""
import os
import sys
import tempfile
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")

import numpy as np
import pandas as pd

import modin_spark.pandas as mpd

VERBOSE = "--verbose" in sys.argv
RESULTS = []


def _norm(x):
    if hasattr(x, "to_pandas"):
        x = x.to_pandas()
    return x


def probe(name, fn_p, fn_m):
    try:
        exp = fn_p()
        exp_exc = None
    except Exception as e:
        exp, exp_exc = None, type(e).__name__
    try:
        got = _norm(fn_m())
        got_exc = None
    except Exception as e:
        got, got_exc = None, type(e).__name__
    if exp_exc or got_exc:
        ok = exp_exc == got_exc
        detail = f"exc exp={exp_exc} got={got_exc}"
    else:
        try:
            if isinstance(exp, pd.DataFrame):
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_index_type=False, check_column_type=False,
                                              check_freq=False)
            elif isinstance(exp, pd.Series):
                pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                               check_index_type=False, check_freq=False)
            else:
                assert got == exp or (pd.isna(got) and pd.isna(exp)), (got, exp)
            ok, detail = True, ""
        except Exception as e:
            ok, detail = False, str(e).replace("\n", " | ")[:260]
    RESULTS.append((name, ok, detail))
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  :: " + detail))


rng = np.random.default_rng(44)
TMP = tempfile.mkdtemp(prefix="probe44_")
pf = pd.DataFrame({"a": [3, 1, 2, 4], "b": [1.5, None, 2.5, 0.5], "c": list("wxyz")})
mf = mpd.DataFrame(pf)

# ---- writer round trips ------------------------------------------------------
pq_dir = os.path.join(TMP, "w.parquet")
probe("to_parquet_roundtrip",
      lambda: pf.sort_values("a").reset_index(drop=True),
      lambda: (mf.to_parquet(pq_dir),
               mpd.read_parquet(pq_dir).sort_values("a").reset_index(drop=True))[1])
csv_dir = os.path.join(TMP, "w_csv")
probe("to_csv_roundtrip",
      lambda: pf.sort_values("a").reset_index(drop=True),
      lambda: (mf.to_csv(csv_dir, index=False),
               mpd.read_csv(csv_dir).sort_values("a").reset_index(drop=True))[1])
jsn_dir = os.path.join(TMP, "w_json")
probe("to_json_roundtrip",
      lambda: pf[["a", "c"]].sort_values("a").reset_index(drop=True),
      lambda: (mf[["a", "c"]].to_json(jsn_dir),
               mpd.read_json(jsn_dir).sort_values("a")[["a", "c"]].reset_index(drop=True))[1])

# ---- tz chains ----------------------------------------------------------------
pdt = pd.Series(pd.date_range("2024-03-09 22:00", periods=6, freq="2h"))  # spans US DST
mdt = mpd.Series(pdt)
probe("tz_localize_convert",
      lambda: pdt.dt.tz_localize("UTC").dt.tz_convert("America/New_York").astype(str),
      lambda: mdt.dt.tz_localize("UTC").dt.tz_convert("America/New_York").astype(str))
probe("tz_convert_back_naive",
      lambda: pdt.dt.tz_localize("UTC").dt.tz_convert("Asia/Tokyo").dt.tz_localize(None),
      lambda: mdt.dt.tz_localize("UTC").dt.tz_convert("Asia/Tokyo").dt.tz_localize(None))

# ---- window .apply -------------------------------------------------------------
ps = pd.Series(rng.normal(size=40))
ms = mpd.Series(ps)
probe("rolling_apply_raw",
      lambda: ps.rolling(5).apply(lambda a: a.max() - a.min(), raw=True),
      lambda: ms.rolling(5).apply(lambda a: a.max() - a.min(), raw=True))
probe("expanding_apply",
      lambda: ps.expanding(3).apply(lambda a: float(np.median(a)), raw=True),
      lambda: ms.expanding(3).apply(lambda a: float(np.median(a)), raw=True))
probe("rolling_center_sum", lambda: ps.rolling(5, center=True).sum(),
      lambda: ms.rolling(5, center=True).sum())

# ---- groupby.apply shapes --------------------------------------------------------
pg = pd.DataFrame({"g": list("aabbc"), "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
mg = mpd.DataFrame(pg)
probe("gb_apply_scalar",
      lambda: pg.groupby("g")["v"].apply(lambda s: float(s.sum())),
      lambda: mg.groupby("g")["v"].apply(lambda s: float(s.sum())))
probe("gb_apply_frame",
      lambda: pg.groupby("g", group_keys=False)[["v"]].apply(lambda d: d - d.mean()),
      lambda: mg.groupby("g", group_keys=False)[["v"]].apply(lambda d: d - d.mean()))
probe("gb_transform_lambda",
      lambda: pg.groupby("g")["v"].transform(lambda s: s.rank()),
      lambda: mg.groupby("g")["v"].transform(lambda s: s.rank()))
probe("gb_idxmin", lambda: pg.groupby("g")["v"].idxmin(),
      lambda: mg.groupby("g")["v"].idxmin())
probe("gb_cummax", lambda: pg.groupby("g")["v"].cummax(),
      lambda: mg.groupby("g")["v"].cummax())

# ---- compare / combine -------------------------------------------------------------
p2 = pf.assign(b=[1.5, 9.0, 2.5, 0.5])
m2 = mpd.DataFrame(p2)
probe("df_compare", lambda: pf.compare(p2), lambda: mf.compare(m2))
probe("df_combine_func",
      lambda: pf[["a", "b"]].combine(p2[["a", "b"]], lambda s1, s2: s1.where(s1 > s2, s2)),
      lambda: mf[["a", "b"]].combine(m2[["a", "b"]], lambda s1, s2: s1.where(s1 > s2, s2)))
probe("df_equals_true", lambda: pf.equals(pf.copy()), lambda: mf.equals(mpd.DataFrame(pf)))

# ---- axis metadata ------------------------------------------------------------------
probe("rename_axis", lambda: pf.set_index("c").rename_axis("rows").reset_index(),
      lambda: mf.set_index("c").rename_axis("rows").reset_index())
probe("set_axis_columns", lambda: pf.set_axis(["x1", "x2", "x3"], axis=1),
      lambda: mf.set_axis(["x1", "x2", "x3"], axis=1))
pmc = pd.DataFrame({("u", 1): [1], ("u", 2): [2]})
probe("droplevel_axis1", lambda: pmc.droplevel(0, axis=1),
      lambda: mpd.DataFrame(pmc).droplevel(0, axis=1))

# ---- dtype machinery -----------------------------------------------------------------
probe("astype_errors_ignore",
      lambda: pf["c"].astype(int, errors="ignore"),
      lambda: mf["c"].astype(int, errors="ignore"))
probe("convert_dtypes_kinds",
      lambda: [str(t) for t in pf.convert_dtypes().dtypes],
      lambda: [str(t) for t in mf.convert_dtypes().dtypes])
probe("select_dtypes_exclude",
      lambda: pf.select_dtypes(exclude=["object"]),
      lambda: mf.select_dtypes(exclude=["object"]))
probe("infer_objects",
      lambda: pd.DataFrame({"x": pd.Series([1, 2], dtype="object")}).infer_objects().dtypes["x"].kind,
      lambda: mpd.DataFrame({"x": pd.Series([1, 2], dtype="object")}).infer_objects().dtypes["x"].kind)

# ---- scalar access -------------------------------------------------------------------
probe("at_read", lambda: pf.set_index("c").at["x", "a"],
      lambda: mf.set_index("c").at["x", "a"])
probe("iat_read", lambda: pf.iat[2, 0], lambda: mf.iat[2, 0])
probe("squeeze_col", lambda: pf[["a"]].squeeze(), lambda: mf[["a"]].squeeze())

# ---- numpy veneer ---------------------------------------------------------------------
import modin_spark.numpy as mnp

probe("np_where",
      lambda: np.where(pf["a"].to_numpy() > 2, 1.0, 0.0).tolist(),
      lambda: mnp.where(mf["a"] > 2, 1.0, 0.0).to_numpy().tolist())
probe("np_log1p",
      lambda: np.log1p(pf["a"].to_numpy()).tolist(),
      lambda: mnp.log1p(mnp.array(mf["a"])).to_numpy().tolist())

# ---- period / interval -----------------------------------------------------------------
pper = pd.Series(pd.date_range("2024-01-15", periods=4, freq="ME"))
mper = mpd.Series(pper)
probe("period_m_plus1",
      lambda: (pper.dt.to_period("M") + 1).astype(str),
      lambda: (mper.dt.to_period("M") + 1).astype(str))
probe("between_time_probe",
      lambda: pd.DataFrame({"v": range(6)}, index=pd.date_range("2024-01-01", periods=6, freq="5h")).between_time("04:00", "16:00"),
      lambda: mpd.DataFrame(pd.DataFrame({"v": range(6)}, index=pd.date_range("2024-01-01", periods=6, freq="5h"))).between_time("04:00", "16:00"))

# ---- polars veneer ---------------------------------------------------------------------
try:
    import modin_spark.polars as mpl

    probe("polars_filter_select",
          lambda: pd.DataFrame({"a": [2, 3], "b": [20.0, 30.0]}).reset_index(drop=True),
          lambda: mpl.DataFrame({"a": [1, 2, 3], "b": [10.0, 20.0, 30.0]})
                    .filter(mpl.col("a") > 1).select(["a", "b"]).to_pandas().reset_index(drop=True))
except ImportError:
    pass

n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
print(f"\n{len(RESULTS)} probes, {n_fail} failures")
sys.exit(1 if n_fail else 0)
