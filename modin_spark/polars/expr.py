"""Polars expressions compiled to Spark Columns.

Reference surface: polars' Expr as used by modin/polars (dataframe.py:1052
select, groupby.py agg). An Expr is a deferred ``SparkFrame -> Column``
function plus an output name and an is-aggregation flag; DataFrame.select /
filter / with_columns / group_by().agg() evaluate it against their frame.
Everything stays JVM-side (pyspark.sql.functions), no UDFs.
"""
from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit(v):
    if isinstance(v, Expr):
        return v
    return Expr(lambda fr, _v=v: F.lit(_v), name="literal")


class Expr:
    def __init__(self, fn: Callable, name: str | None = None, agg: bool = False):
        self._fn = fn
        self._name = name
        self._agg = agg  # True once an aggregation (sum/mean/...) is applied

    # ------------------------------------------------------------- plumbing
    def _col(self, fr) -> Column:
        return self._fn(fr)

    def _wrap(self, fn, name=None, agg=None) -> "Expr":
        return Expr(fn, name=name if name is not None else self._name,
                    agg=self._agg if agg is None else agg)

    def _binop(self, other, op, name=None) -> "Expr":
        o = _lit(other)
        return Expr(lambda fr: op(self._fn(fr), o._fn(fr)),
                    name=name or self._name, agg=self._agg or o._agg)

    def alias(self, name: str) -> "Expr":
        return Expr(self._fn, name=name, agg=self._agg)

    name = property(lambda self: self._name)

    # ------------------------------------------------------------ operators
    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: b / a)

    def __mod__(self, o):
        return self._binop(o, lambda a, b: a % b)

    def __pow__(self, o):
        return self._binop(o, lambda a, b: a ** b)

    def __neg__(self):
        return self._wrap(lambda fr: -self._fn(fr))

    def __gt__(self, o):
        return self._binop(o, lambda a, b: a > b)

    def __ge__(self, o):
        return self._binop(o, lambda a, b: a >= b)

    def __lt__(self, o):
        return self._binop(o, lambda a, b: a < b)

    def __le__(self, o):
        return self._binop(o, lambda a, b: a <= b)

    def __eq__(self, o):  # noqa: A003
        return self._binop(o, lambda a, b: a == b)

    def __ne__(self, o):
        return self._binop(o, lambda a, b: a != b)

    def __and__(self, o):
        return self._binop(o, lambda a, b: a & b)

    def __or__(self, o):
        return self._binop(o, lambda a, b: a | b)

    def __invert__(self):
        return self._wrap(lambda fr: ~self._fn(fr))

    # ---------------------------------------------------------- aggregations
    def _aggwrap(self, sfn) -> "Expr":
        return Expr(lambda fr: sfn(self._fn(fr)), name=self._name, agg=True)

    def sum(self):
        return self._aggwrap(F.sum)

    def mean(self):
        return self._aggwrap(F.avg)

    def min(self):  # noqa: A003
        return self._aggwrap(F.min)

    def max(self):  # noqa: A003
        return self._aggwrap(F.max)

    def median(self):
        return self._aggwrap(F.median)

    def count(self):
        return self._aggwrap(F.count)

    def n_unique(self):
        return self._aggwrap(lambda c: F.count_distinct(c) + F.max(F.when(c.isNull(), 1).otherwise(0)))

    def std(self, ddof: int = 1):
        return self._aggwrap(F.stddev_samp if ddof == 1 else F.stddev_pop)

    def var(self, ddof: int = 1):
        return self._aggwrap(F.var_samp if ddof == 1 else F.var_pop)

    def first(self):
        return self._aggwrap(lambda c: F.first(c, ignorenulls=False))

    def last(self):
        return self._aggwrap(lambda c: F.last(c, ignorenulls=False))

    def quantile(self, q: float, interpolation: str = "nearest"):
        return self._aggwrap(lambda c: F.percentile(c, F.lit(q)))

    # ------------------------------------------------------------ elementwise
    def abs(self):  # noqa: A003
        return self._wrap(lambda fr: F.abs(self._fn(fr)))

    def floor(self):
        return self._wrap(lambda fr: F.floor(self._fn(fr)).cast("double"))

    def ceil(self):
        return self._wrap(lambda fr: F.ceil(self._fn(fr)).cast("double"))

    def round(self, decimals: int = 0):  # noqa: A003
        return self._wrap(lambda fr: F.round(self._fn(fr), decimals))

    def sqrt(self):
        return self._wrap(lambda fr: F.sqrt(self._fn(fr)))

    def log(self, base: float | None = None):
        if base is None:
            return self._wrap(lambda fr: F.log(self._fn(fr)))
        return self._wrap(lambda fr: F.log(float(base), self._fn(fr)))

    def exp(self):
        return self._wrap(lambda fr: F.exp(self._fn(fr)))

    def is_null(self):
        return self._wrap(lambda fr: self._fn(fr).isNull())

    def is_not_null(self):
        return self._wrap(lambda fr: self._fn(fr).isNotNull())

    def is_in(self, values):
        vals = list(values)
        return self._wrap(lambda fr: self._fn(fr).isin(vals))

    def is_between(self, lo, hi, closed: str = "both"):
        ops = {
            "both": lambda c: (c >= F.lit(lo)) & (c <= F.lit(hi)),
            "left": lambda c: (c >= F.lit(lo)) & (c < F.lit(hi)),
            "right": lambda c: (c > F.lit(lo)) & (c <= F.lit(hi)),
            "none": lambda c: (c > F.lit(lo)) & (c < F.lit(hi)),
        }
        return self._wrap(lambda fr: ops[closed](self._fn(fr)))

    def fill_null(self, value):
        return self._wrap(lambda fr: F.coalesce(self._fn(fr), F.lit(value)))

    def cast(self, dtype) -> "Expr":
        t = _POLARS_TO_SPARK.get(getattr(dtype, "__name__", str(dtype)), str(dtype))
        return self._wrap(lambda fr: self._fn(fr).cast(t))

    def clip(self, lower=None, upper=None):
        def f(fr):
            c = self._fn(fr)
            if lower is not None:
                c = F.greatest(c, F.lit(lower))
            if upper is not None:
                c = F.least(c, F.lit(upper))
            return c
        return self._wrap(f)

    # ----------------------------------------------------------- namespaces
    @property
    def str(self) -> "_StrNS":  # noqa: A003
        return _StrNS(self)

    @property
    def dt(self) -> "_DtNS":
        return _DtNS(self)


_POLARS_TO_SPARK = {
    "Int8": "tinyint", "Int16": "smallint", "Int32": "int", "Int64": "bigint",
    "UInt32": "bigint", "UInt64": "bigint",
    "Float32": "float", "Float64": "double",
    "Utf8": "string", "String": "string", "Boolean": "boolean",
    "Date": "date", "Datetime": "timestamp",
}


class _StrNS:
    def __init__(self, e: Expr):
        self._e = e

    def _w(self, fn):
        e = self._e
        return e._wrap(lambda fr: fn(e._fn(fr)))

    def to_uppercase(self):
        return self._w(F.upper)

    def to_lowercase(self):
        return self._w(F.lower)

    def len_chars(self):
        return self._w(F.length)

    def contains(self, pat: str, literal: bool = False):
        if literal:
            return self._w(lambda c: c.contains(pat))
        return self._w(lambda c: c.rlike(pat))

    def starts_with(self, s: str):
        return self._w(lambda c: c.startswith(s))

    def ends_with(self, s: str):
        return self._w(lambda c: c.endswith(s))

    def replace_all(self, pat: str, repl: str, literal: bool = False):
        import re as _re

        p = _re.escape(pat) if literal else pat
        return self._w(lambda c: F.regexp_replace(c, p, repl))

    def strip_chars(self, chars: str | None = None):
        if chars is None:
            return self._w(F.trim)
        return self._w(lambda c: F.btrim(c, F.lit(chars)))

    def slice(self, offset: int, length: int | None = None):  # noqa: A003
        n = length if length is not None else (1 << 30)
        return self._w(lambda c: F.substring(c, offset + 1, n))

    def split(self, by: str):
        import re as _re

        return self._w(lambda c: F.split(c, _re.escape(by)))


class _DtNS:
    def __init__(self, e: Expr):
        self._e = e

    def _w(self, fn):
        e = self._e
        return e._wrap(lambda fr: fn(e._fn(fr)))

    def year(self):
        return self._w(F.year)

    def month(self):
        return self._w(F.month)

    def day(self):
        return self._w(F.dayofmonth)

    def hour(self):
        return self._w(F.hour)

    def minute(self):
        return self._w(F.minute)

    def second(self):
        return self._w(F.second)

    def weekday(self):
        # polars: Monday=1 .. Sunday=7; Spark dayofweek: Sunday=1 .. Saturday=7
        return self._w(lambda c: (F.dayofweek(c) + 5) % 7 + 1)

    def date(self):
        return self._w(F.to_date)

    def truncate(self, every: str):
        unit = {"1d": "day", "1h": "hour", "1mo": "month", "1y": "year",
                "1m": "minute"}.get(every, every)
        return self._w(lambda c: F.date_trunc(unit, c))


def col(name: str) -> Expr:
    """polars.col — resolve a column by label at evaluation time."""
    if name == "*":
        raise NotImplementedError("col('*'): use DataFrame.select(all columns)")
    return Expr(lambda fr: fr.scol(fr.positions_of([name])[0]), name=name)


def lit(value) -> Expr:
    return Expr(lambda fr: F.lit(value), name="literal")


def len() -> Expr:  # noqa: A003
    """polars.len(): row count aggregation."""
    return Expr(lambda fr: F.count(F.lit(1)), name="len", agg=True)
