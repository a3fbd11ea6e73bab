"""Small-frame native execution.

Reference parity: the reference's NativeQueryCompiler / small-query
auto-switch (modin/core/storage_formats/pandas/native_query_compiler.py,
query_compiler_caster.py:161) runs tiny frames in plain pandas because the
distributed engine's per-op overhead dwarfs the work. Here: when EVERY
engine input of an op is a pristine deferred-ingest frame
(``SparkFrame.native_pdf`` set, ``_sdf`` never materialized), the op runs in
driver pandas and the result re-enters the lazy-ingest path — a chain of
tiny interactive ops never touches the JVM. The first op outside the
dispatch table (or the first input above the MODIN_SPARK_NATIVE_MAX_ROWS
threshold) materializes the identical Spark plan, so results never fork by
execution path beyond pandas being MORE exact (e.g. uint dtypes survive).

Ops are dispatched from explicit guards at engine method heads — no
monkey-patching, no __getattr__ magic — so the set of native-capable ops is
grep-able and each forwards only kwargs whose semantics match pandas 1:1.
"""

from __future__ import annotations

import pandas as pd


class _Bail(Exception):
    """An argument cannot be represented natively — fall through to Spark."""


def native_pdf_of(obj):
    """The pandas object behind a PRISTINE deferred-ingest engine frame,
    else None (materialized, derived, or not an engine object)."""
    fr = getattr(obj, "_frame", None)
    if fr is None:
        return None
    if fr._sdf is None and fr.native_pdf is not None:
        return fr.native_pdf
    return None


def _convert_arg(x):
    from modin_spark.pandas.dataframe import DataFrame
    from modin_spark.pandas.series import Series

    if isinstance(x, DataFrame):
        p = native_pdf_of(x)
        if p is None:
            raise _Bail
        return p
    if isinstance(x, Series):
        # engine Series are expression-bound to a frame; ONLY a direct
        # column extraction (marked by _series_at) replays as pdf[label] —
        # a derived Series like df["a"]+1 keeps the NAME "a" but is not
        # column "a", so trusting the name would silently use stale values
        p = native_pdf_of(x)
        pos = getattr(x, "_native_col", None)
        if p is not None and pos is not None:
            return p.iloc[:, pos]
        raise _Bail
    if isinstance(x, dict):
        return {k: _convert_arg(v) for k, v in x.items()}
    return x


def _wrap(res):
    from modin_spark.pandas.io import from_pandas
    from modin_spark.pandas.series import Series

    if isinstance(res, pd.DataFrame):
        return from_pandas(res)
    if isinstance(res, pd.Series):
        return Series._from_pandas(res)
    return res


def series_pdf_of(s):
    """The pandas Series behind a plain-column extraction of a pristine
    native frame (the _series_at marker), else None."""
    p = native_pdf_of(s)
    pos = getattr(s, "_native_col", None)
    if p is not None and pos is not None:
        out = p.iloc[:, pos]
        if out.name == "__ser__":
            # unnamed-series ingest marker, not a user label
            out = out.rename(None)
        return out


def maybe_series(s, name, *args, _raw: bool = False, **kwargs):
    """Series counterpart of maybe(): run pandas.Series.<name> natively when
    ``s`` is a marked plain-column extraction of a pristine native frame."""
    ps = series_pdf_of(s)
    if ps is None:
        return None
    try:
        a2 = [_convert_arg(a) for a in args]
        k2 = {k: _convert_arg(v) for k, v in kwargs.items()}
        res = getattr(ps.copy(), name)(*a2, **k2)
    except _Bail:
        return None
    except Exception:
        return None
    return res if _raw else _wrap(res)


def maybe_groupby(g, method, *args, **kwargs):
    """GroupBy counterpart: run pandas groupby.<method> natively when the
    grouped frame is pristine native and the keys are plain labels (Series
    keys are materialized as hidden columns first, which already takes the
    frame off the pristine path — automatic fallthrough). A SeriesGroupBy
    (df.groupby(k)[col]) replays as pdf.groupby(k)[col]."""
    col = None
    if not hasattr(g, "_df"):  # SeriesGroupBy wrapping a frame groupby
        inner = getattr(g, "_g", None)
        if inner is None:
            return None
        col = getattr(g, "_col", None)
        g = inner
    pdf = native_pdf_of(g._df)
    if pdf is None:
        return None
    try:
        gb = pdf.copy().groupby(g._by_labels, as_index=g._as_index,
                                dropna=g._dropna, sort=g._sort,
                                observed=getattr(g, "_observed", True))
        if col is not None:
            gb = gb[col]
        vl = getattr(g, "_value_labels", None)
        if vl is not None and col is None:
            gb = gb[list(vl)]
        fn = getattr(gb, method)
        a2 = [_convert_arg(a) for a in args]
        k2 = {k: _convert_arg(v) for k, v in kwargs.items()}
        res = fn(*a2, **k2)
    except _Bail:
        return None
    except Exception:
        return None
    return _wrap(res)


def maybe(df, name, *args, _raw: bool = False, **kwargs):
    """Run ``pandas.DataFrame.<name>(*args, **kwargs)`` natively when ``df``
    (and every engine-object argument) is a pristine native frame. Returns
    the wrapped engine result (or the raw pandas object when ``_raw``, for
    engine methods whose contract already returns driver pandas), or None to
    fall through to the Spark path — including when pandas itself raises, so
    an argument shape only the engine accepts still gets its engine
    behavior. Only called with kwargs whose pandas semantics the engine
    matches."""
    pdf = native_pdf_of(df)
    if pdf is None:
        return None
    try:
        a2 = [_convert_arg(a) for a in args]
        k2 = {k: _convert_arg(v) for k, v in kwargs.items()}
        # copy() guards the cached object against inplace-mutating pandas ops
        res = getattr(pdf.copy(), name)(*a2, **k2)
    except _Bail:
        return None
    except Exception:
        return None  # pandas rejected it — the Spark path is authoritative
    return res if _raw else _wrap(res)
