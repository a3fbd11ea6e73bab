"""Probe wave 53 (r15): alignment on NON-UNIQUE indexes (pandas produces
a per-label cartesian on duplicate labels; mismatched dup counts raise),
DST-boundary timezone math (localize/convert across the spring-forward /
fall-back instants, nonexistent/ambiguous args), anchored offset
arithmetic (BDay/MonthEnd/QuarterBegin shifts), datetime floor/ceil/round
near boundaries, and Series combine_first/align with duplicate labels.
Differential vs real pandas.

Usage: python tools/probe_wave53.py [--verbose]
"""
import os
import sys
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


# ----------------------------------------- duplicate-label alignment
pa = pd.Series([1.0, 2.0, 3.0], index=["a", "a", "b"])
pb = pd.Series([10.0, 20.0], index=["a", "b"])
def MA():
    return mpd.Series([1.0, 2.0, 3.0], index=["a", "a", "b"])
def MB():
    return mpd.Series([10.0, 20.0], index=["a", "b"])

probe("dupalign_add_unique_other",
      lambda: (pa + pb).sort_index(),
      lambda: (MA() + MB()).sort_index())
probe("dupalign_add_both_dup",
      lambda: (pa + pa).sort_index(),
      lambda: (MA() + MA()).sort_index())
probe("dupalign_sub_scalar_ok",
      lambda: (pa - 1).sort_index(),
      lambda: (MA() - 1).sort_index())
probe("dupalign_combine_first",
      lambda: pb.combine_first(pa).sort_index(),
      lambda: MB().combine_first(MA()).sort_index())
probe("dupalign_mul_disjoint",
      lambda: (pa * pd.Series([5.0], index=["c"])).sort_index(),
      lambda: (MA() * mpd.Series([5.0], index=["c"])).sort_index())
pfa = pd.DataFrame({"x": [1.0, 2.0, 3.0]}, index=["a", "a", "b"])
pfb = pd.DataFrame({"x": [10.0, 20.0]}, index=["a", "b"])
probe("dupalign_frame_add",
      lambda: (pfa + pfb).sort_index(),
      lambda: (mpd.DataFrame(pfa) + mpd.DataFrame(pfb)).sort_index())
probe("dupalign_fillna_series",
      lambda: pd.Series([np.nan, 2.0, np.nan], index=["a", "a", "b"]).fillna(pb).sort_index(),
      lambda: mpd.Series([np.nan, 2.0, np.nan], index=["a", "a", "b"]).fillna(MB()).sort_index())

# ----------------------------------------------------- DST boundaries
# US/Eastern: 2024-03-10 02:00 spring-forward (nonexistent), 2024-11-03
# 01:00-02:00 fall-back (ambiguous)
naive = pd.Series(pd.to_datetime([
    "2024-03-10 01:30:00", "2024-03-10 03:30:00",
    "2024-11-03 00:30:00", "2024-11-03 02:30:00", "2024-06-15 12:00:00",
]))
def MNV():
    return mpd.Series(naive)

probe("dst_localize_utc_then_convert",
      lambda: naive.dt.tz_localize("UTC").dt.tz_convert("America/New_York").astype(str),
      lambda: MNV().dt.tz_localize("UTC").dt.tz_convert("America/New_York").astype(str))
probe("dst_localize_eastern_plain",
      lambda: naive.dt.tz_localize("America/New_York", ambiguous=True).astype(str),
      lambda: MNV().dt.tz_localize("America/New_York", ambiguous=True).astype(str))
probe("dst_convert_roundtrip_hour",
      lambda: (naive.dt.tz_localize("UTC").dt.tz_convert("America/New_York")
               + pd.Timedelta("1h")).astype(str),
      lambda: (MNV().dt.tz_localize("UTC").dt.tz_convert("America/New_York")
               + pd.Timedelta("1h")).astype(str))
probe("dst_hour_accessor_after_convert",
      lambda: naive.dt.tz_localize("UTC").dt.tz_convert("America/New_York").dt.hour,
      lambda: MNV().dt.tz_localize("UTC").dt.tz_convert("America/New_York").dt.hour)
probe("dst_utc_offset_delta",
      lambda: (naive.dt.tz_localize("UTC").dt.tz_convert("America/New_York").dt.day),
      lambda: (MNV().dt.tz_localize("UTC").dt.tz_convert("America/New_York").dt.day))

# ----------------------------------------------------- anchored offsets
ds = pd.Series(pd.to_datetime([
    "2024-01-31", "2024-02-29", "2024-03-15", "2023-12-31", "2024-07-04",
]))
def MDS():
    return mpd.Series(ds)

probe("offset_monthend",
      lambda: ds + pd.offsets.MonthEnd(1),
      lambda: MDS() + pd.offsets.MonthEnd(1))
probe("offset_monthbegin",
      lambda: ds + pd.offsets.MonthBegin(1),
      lambda: MDS() + pd.offsets.MonthBegin(1))
probe("offset_bday",
      lambda: ds + pd.offsets.BDay(3),
      lambda: MDS() + pd.offsets.BDay(3))
probe("offset_quarterend",
      lambda: ds + pd.offsets.QuarterEnd(1),
      lambda: MDS() + pd.offsets.QuarterEnd(1))
probe("offset_yearbegin_sub",
      lambda: ds - pd.offsets.YearBegin(1),
      lambda: MDS() - pd.offsets.YearBegin(1))
probe("offset_week_monday",
      lambda: ds + pd.offsets.Week(weekday=0),
      lambda: MDS() + pd.offsets.Week(weekday=0))

# ----------------------------------------------- floor/ceil/round edges
ts = pd.Series(pd.to_datetime([
    "2024-01-01 12:30:00", "2024-01-01 12:29:59.999999",
    "2024-01-01 00:00:00", "2024-01-01 23:59:59",
], format="mixed"))
def MTS():
    return mpd.Series(ts)

probe("dt_floor_hour", lambda: ts.dt.floor("h"), lambda: MTS().dt.floor("h"))
probe("dt_ceil_hour", lambda: ts.dt.ceil("h"), lambda: MTS().dt.ceil("h"))
probe("dt_round_hour_halfeven", lambda: ts.dt.round("h"), lambda: MTS().dt.round("h"))
probe("dt_floor_15min", lambda: ts.dt.floor("15min"), lambda: MTS().dt.floor("15min"))
probe("dt_round_day", lambda: ts.dt.round("D"), lambda: MTS().dt.round("D"))

# ----------------------------------------------- align / misc
probe("align_outer_series",
      lambda: tuple(x.sort_index().tolist() for x in pa.align(pb, fill_value=0.0)),
      lambda: tuple(_norm(x).sort_index().tolist() for x in MA().align(MB(), fill_value=0.0)))
probe("series_eq_dup_index_raises",
      lambda: (pa == pd.Series([1.0, 2.0], index=["a", "c"])),
      lambda: (MA() == mpd.Series([1.0, 2.0], index=["a", "c"])))
probe("reindex_method_ffill",
      lambda: pd.Series([1.0, 2.0], index=[0, 10]).reindex(range(0, 12, 5), method="ffill"),
      lambda: mpd.Series([1.0, 2.0], index=[0, 10]).reindex(range(0, 12, 5), method="ffill"))
probe("reindex_tolerance",
      lambda: pd.Series([1.0, 2.0], index=[0, 10]).reindex([1, 9], method="nearest", tolerance=2),
      lambda: mpd.Series([1.0, 2.0], index=[0, 10]).reindex([1, 9], method="nearest", tolerance=2))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
