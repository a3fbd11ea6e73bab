"""Probe wave 57 (r15): IO kwarg tail — read_csv (header=None+names,
index_col, usecols list/callable, dtype dict, na_values custom/dict,
skiprows list/callable, comment, thousands, decimal, nrows, sep regex,
compression), to_csv round trips (sep, na_rep, float_format, columns,
header rename, quoting), read_json orient variants, read_parquet columns
pruning. Differential vs real pandas over the same temp files.

Usage: python tools/probe_wave57.py [--verbose]
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
TMP = tempfile.mkdtemp(prefix="w57_")


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
                assert got == exp, (got, exp)
            ok, detail = True, ""
        except Exception as e:
            ok, detail = False, str(e).replace("\n", " | ")[:260]
    RESULTS.append((name, ok, detail))
    if VERBOSE or not ok:
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  :: " + detail))


# fixture csv files
base = os.path.join(TMP, "base.csv")
with open(base, "w") as f:
    f.write("a,b,c\n1,x,1.5\n2,y,2.5\n3,z,-1.0\n4,x,0.25\n")

noheader = os.path.join(TMP, "nh.csv")
with open(noheader, "w") as f:
    f.write("1,x\n2,y\n3,z\n")

messy = os.path.join(TMP, "messy.csv")
with open(messy, "w") as f:
    f.write("# comment line\na;b;c\n1;NA;1.234,5\n2;hit;7,0\n-;miss;9,25\n")

gz = os.path.join(TMP, "base.csv.gz")
import gzip
with gzip.open(gz, "wt") as f:
    f.write("a,b\n1,p\n2,q\n")

probe("csv_header_none_names",
      lambda: pd.read_csv(noheader, header=None, names=["n", "s"]),
      lambda: mpd.read_csv(noheader, header=None, names=["n", "s"]))
probe("csv_index_col",
      lambda: pd.read_csv(base, index_col="a"),
      lambda: mpd.read_csv(base, index_col="a"))
probe("csv_index_col_pos",
      lambda: pd.read_csv(base, index_col=0),
      lambda: mpd.read_csv(base, index_col=0))
probe("csv_usecols_list",
      lambda: pd.read_csv(base, usecols=["a", "c"]),
      lambda: mpd.read_csv(base, usecols=["a", "c"]))
probe("csv_usecols_callable",
      lambda: pd.read_csv(base, usecols=lambda c: c != "b"),
      lambda: mpd.read_csv(base, usecols=lambda c: c != "b"))
probe("csv_dtype_dict",
      lambda: pd.read_csv(base, dtype={"a": "float64", "b": "object"}).dtypes.astype(str).to_dict(),
      lambda: mpd.read_csv(base, dtype={"a": "float64", "b": "object"}).dtypes.astype(str).to_dict())
probe("csv_na_values_custom",
      lambda: pd.read_csv(messy, sep=";", comment="#", na_values=["-", "NA"]),
      lambda: mpd.read_csv(messy, sep=";", comment="#", na_values=["-", "NA"]))
probe("csv_na_values_dict",
      lambda: pd.read_csv(messy, sep=";", comment="#", na_values={"b": ["miss"]}),
      lambda: mpd.read_csv(messy, sep=";", comment="#", na_values={"b": ["miss"]}))
probe("csv_decimal_comma",
      lambda: pd.read_csv(messy, sep=";", comment="#", decimal=","),
      lambda: mpd.read_csv(messy, sep=";", comment="#", decimal=","))
probe("csv_skiprows_list",
      lambda: pd.read_csv(base, skiprows=[1, 3]),
      lambda: mpd.read_csv(base, skiprows=[1, 3]))
probe("csv_skiprows_callable",
      lambda: pd.read_csv(base, skiprows=lambda i: i > 0 and i % 2 == 0),
      lambda: mpd.read_csv(base, skiprows=lambda i: i > 0 and i % 2 == 0))
probe("csv_nrows",
      lambda: pd.read_csv(base, nrows=2),
      lambda: mpd.read_csv(base, nrows=2))
probe("csv_gzip",
      lambda: pd.read_csv(gz),
      lambda: mpd.read_csv(gz))
probe("csv_thousands",
      lambda: pd.read_csv(os.path.join(TMP, "th.csv") if open(os.path.join(TMP, "th.csv"), "w").write("a\n\"1,000\"\n\"2,500\"\n") else os.path.join(TMP, "th.csv"), thousands=","),
      lambda: mpd.read_csv(os.path.join(TMP, "th.csv"), thousands=","))

pdf = pd.DataFrame({"a": [1.25, np.nan, 3.0], "b": ["x,y", "q\"z", None]})
def MD():
    return mpd.DataFrame(pdf)

def rt(write_kwargs, read_kwargs=None):
    path_p = os.path.join(TMP, "rt_p.csv")
    path_m = os.path.join(TMP, "rt_m.csv")
    pdf.to_csv(path_p, index=False, **write_kwargs)
    MD().to_csv(path_m, index=False, **write_kwargs)
    rk = read_kwargs or {}
    return pd.read_csv(path_p, **rk), pd.read_csv(path_m, **rk)

probe("tocsv_na_rep",
      lambda: rt({"na_rep": "MISSING"})[0],
      lambda: rt({"na_rep": "MISSING"})[1])
probe("tocsv_float_format",
      lambda: rt({"float_format": "%.1f"})[0],
      lambda: rt({"float_format": "%.1f"})[1])
probe("tocsv_sep_pipe",
      lambda: rt({"sep": "|"}, {"sep": "|"})[0],
      lambda: rt({"sep": "|"}, {"sep": "|"})[1])
probe("tocsv_subset_columns",
      lambda: rt({"columns": ["b"]})[0],
      lambda: rt({"columns": ["b"]})[1])
probe("tocsv_header_rename",
      lambda: rt({"header": ["A", "B"]})[0],
      lambda: rt({"header": ["A", "B"]})[1])

# json orients
pj = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
for orient in ["records", "split", "columns", "table"]:
    def mk(orient=orient):
        pp = os.path.join(TMP, f"j_{orient}_p.json")
        mm = os.path.join(TMP, f"j_{orient}_m.json")
        pj.to_json(pp, orient=orient)
        mpd.DataFrame(pj).to_json(mm, orient=orient)
        a = pd.read_json(pp, orient=orient)
        b = _norm(mpd.read_json(mm, orient=orient))
        return a.reset_index(drop=True), pd.DataFrame(b).reset_index(drop=True)
    probe(f"json_orient_{orient}",
          lambda mk=mk: mk()[0],
          lambda mk=mk: mk()[1])

# the engine's directory-style JSONL output reads back in PARTITION order
# (documented read-order contract for multi-file sources — pandas cannot
# read a directory at all), so the roundtrip compares content, not order
probe("json_lines_roundtrip",
      lambda: (lambda p: (pj.to_json(p, orient="records", lines=True),
                          pd.read_json(p, orient="records", lines=True))[1])(
          os.path.join(TMP, "l_p.json")).sort_values("a").reset_index(drop=True),
      lambda: (lambda p: (mpd.DataFrame(pj).to_json(p, orient="records", lines=True),
                          _norm(mpd.read_json(p, orient="records", lines=True)))[1])(
          os.path.join(TMP, "l_m.json")).sort_values("a").reset_index(drop=True))

# parquet column pruning
pq_path = os.path.join(TMP, "t.parquet")
pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [1.0, 2.0]}).to_parquet(pq_path)
probe("parquet_columns",
      lambda: pd.read_parquet(pq_path, columns=["c", "a"]),
      lambda: mpd.read_parquet(pq_path, columns=["c", "a"]))

npass = sum(1 for _, ok, _ in RESULTS if ok)
print(f"\n{npass}/{len(RESULTS)} passed, {len(RESULTS) - npass} failed")
sys.exit(0 if npass == len(RESULTS) else 1)
