"""Polars-flavored DataFrame/Series/LazyFrame over SparkFrame.

Reference surface: modin/polars/dataframe.py:40 (DataFrame),
series.py (Series), groupby.py (GroupBy), lazyframe.py (LazyFrame).
The reference adapts its pandas query compiler; here every verb maps to
one Spark relational op (select/where/groupBy/orderBy/join/union), so a
select->filter->group_by chain is a single Catalyst plan with pushdown and
whole-stage codegen — and LazyFrame is a zero-cost tag (Spark is lazy).
"""
from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import functions as F

from modin_spark.core.frame import ORDER_COL, SparkFrame, fresh_names
from modin_spark.polars.expr import Expr, col, lit  # noqa: F401


def _as_exprs(exprs, named) -> list[Expr]:
    out = []
    for e in exprs:
        if isinstance(e, (list, tuple)):
            out.extend(_as_exprs(e, {}))
        elif isinstance(e, str):
            out.append(col(e))
        else:
            out.append(e)
    for name, e in (named or {}).items():
        e = col(e) if isinstance(e, str) else e
        out.append(e.alias(name))
    return out


class DataFrame:
    def __init__(self, data=None, schema=None, *, _frame: SparkFrame | None = None):
        if _frame is not None:
            self._frame = _frame
            return
        if isinstance(data, pd.DataFrame):
            pdf = data
        elif isinstance(data, dict):
            pdf = pd.DataFrame({k: (v.to_list() if isinstance(v, Series) else v)
                                for k, v in data.items()})
        elif data is None:
            pdf = pd.DataFrame()
        else:
            pdf = pd.DataFrame(data, columns=schema if isinstance(schema, list) else None)
        self._frame = SparkFrame.from_pandas(pdf.reset_index(drop=True))

    # -------------------------------------------------------------- metadata
    @property
    def columns(self) -> list[str]:
        return [str(c) for c in self._frame.columns]

    @property
    def width(self) -> int:
        return len(self._frame.columns)

    @property
    def height(self) -> int:
        return self._frame.count_rows()

    @property
    def shape(self) -> tuple[int, int]:
        return (self.height, self.width)

    @property
    def schema(self) -> dict:
        return dict(zip(self.columns, self.dtypes))

    @property
    def dtypes(self) -> list[str]:
        return [self._frame.dtype_of(i) for i in range(len(self._frame.columns))]

    def __len__(self) -> int:
        return self.height

    def __repr__(self) -> str:
        return f"shape: {self.shape}\n" + repr(self.head(10).to_pandas())

    def __getitem__(self, item):
        if isinstance(item, str):
            return self.get_column(item)
        if isinstance(item, list) and all(isinstance(c, str) for c in item):
            return self.select(*item)
        if isinstance(item, slice):
            start, stop, step = item.indices(1 << 62)
            return DataFrame(_frame=self._frame.slice_positions(start, stop, step))
        raise TypeError(f"DataFrame[{type(item).__name__}]")

    # ------------------------------------------------------------- core verbs
    def select(self, *exprs, **named_exprs) -> "DataFrame":
        es = _as_exprs(exprs, named_exprs)
        if any(e._agg for e in es):
            # polars: aggregate select yields a 1-row frame
            fr = self._frame
            names = [e._name or f"col{i}" for i, e in enumerate(es)]
            phys = fresh_names(len(es))
            sdf = fr.sdf.agg(*[e._col(fr).alias(p) for e, p in zip(es, phys)])
            sdf = sdf.withColumn(ORDER_COL, F.lit(0).cast("long"))
            return DataFrame(_frame=SparkFrame(sdf, pd.Index(names), phys, [], [None]))
        names = [e._name or f"col{i}" for i, e in enumerate(es)]
        fr = self._frame
        return DataFrame(_frame=fr.project(names, [e._col(fr) for e in es]))

    def with_columns(self, *exprs, **named_exprs) -> "DataFrame":
        es = _as_exprs(exprs, named_exprs)
        fr = self._frame
        names = [e._name or f"col{i}" for i, e in enumerate(es)]
        return DataFrame(_frame=fr.with_columns(names, [e._col(fr) for e in es]))

    def with_row_index(self, name: str = "index", offset: int = 0) -> "DataFrame":
        fr = self._frame.with_global_position("__ri__")
        sdf = fr.sdf.withColumn(name, (F.col("__ri__") + F.lit(offset)).cast("bigint")).drop("__ri__")
        cols = pd.Index([name] + [str(c) for c in fr.columns])
        return DataFrame(_frame=SparkFrame(sdf, cols, [name] + list(fr.data_cols),
                                           fr.index_cols, fr.index_names))

    def filter(self, *predicates) -> "DataFrame":  # noqa: A003
        fr = self._frame
        cond = None
        for p in _as_exprs(predicates, {}):
            c = p._col(fr)
            cond = c if cond is None else (cond & c)
        return DataFrame(_frame=fr.filter(cond))

    def sort(self, by, *more_by, descending: bool = False, nulls_last: bool = False) -> "DataFrame":
        keys = ([by] if isinstance(by, (str, Expr)) else list(by)) + list(more_by)
        fr = self._frame
        exprs = [(col(k) if isinstance(k, str) else k)._col(fr) for k in keys]
        desc = descending if isinstance(descending, (list, tuple)) else [descending] * len(exprs)
        return DataFrame(_frame=fr.sort_by(exprs, [not d for d in desc],
                                           "last" if nulls_last else "first"))

    def group_by(self, *keys, maintain_order: bool = False) -> "GroupBy":
        ks = []
        for k in keys:
            ks.extend(k if isinstance(k, (list, tuple)) else [k])
        return GroupBy(self, [k if isinstance(k, str) else k._name for k in ks])

    def join(self, other: "DataFrame", on=None, how: str = "inner",
             left_on=None, right_on=None, suffix: str = "_right") -> "DataFrame":
        how = {"outer": "full", "cross": "cross"}.get(how, how)
        lf, rf = self._frame, other._frame
        lon = [on] if isinstance(on, str) else (list(on) if on is not None else None)
        l_keys = lon or ([left_on] if isinstance(left_on, str) else list(left_on))
        r_keys = lon or ([right_on] if isinstance(right_on, str) else list(right_on))
        lsdf = lf.sdf
        rsdf = rf.sdf
        rmap = {}
        for c, p in zip(rf.columns, rf.data_cols):
            rmap[str(c)] = p
        cond = None
        for lk, rk in zip(l_keys, r_keys):
            lc = lsdf[lf.data_cols[lf.positions_of([lk])[0]]]
            rc = rsdf[rmap[rk]]
            e = lc == rc
            cond = e if cond is None else (cond & e)
        jhow = {"semi": "left_semi", "anti": "left_anti"}.get(how, how)
        joined = lsdf.join(rsdf.drop(ORDER_COL), cond, jhow)
        if jhow in ("left_semi", "left_anti"):
            return DataFrame(_frame=lf._subset_rows(joined))
        out_labels = [str(c) for c in lf.columns]
        out_phys = list(lf.data_cols)
        for c, p in zip(rf.columns, rf.data_cols):
            c = str(c)
            if c in r_keys and how != "full":
                continue
            lbl = c if c not in out_labels else c + suffix
            out_labels.append(lbl)
            out_phys.append(p)
        if ORDER_COL not in joined.columns:
            joined = joined.withColumn(ORDER_COL, F.monotonically_increasing_id())
        return DataFrame(_frame=SparkFrame(joined, pd.Index(out_labels), out_phys, [], [None]))

    # ---------------------------------------------------------- shape/dedup
    def head(self, n: int = 5) -> "DataFrame":
        return DataFrame(_frame=self._frame.head(n))

    def limit(self, n: int = 5) -> "DataFrame":
        return self.head(n)

    def tail(self, n: int = 5) -> "DataFrame":
        return DataFrame(_frame=self._frame.tail(n))

    def unique(self, subset=None, keep: str = "any", maintain_order: bool = False) -> "DataFrame":
        fr = self._frame
        if subset is None:
            sdf = fr.sdf.dropDuplicates([c for c in fr.data_cols])
        else:
            subs = [subset] if isinstance(subset, str) else list(subset)
            sdf = fr.sdf.dropDuplicates([fr.data_cols[i] for i in fr.positions_of(subs)])
        return DataFrame(_frame=fr._subset_rows(sdf))

    def drop(self, *columns, strict: bool = True) -> "DataFrame":
        dropset = set()
        for c in columns:
            dropset |= set(c) if isinstance(c, (list, tuple)) else {c}
        keep = [i for i, c in enumerate(self.columns) if c not in dropset]
        return DataFrame(_frame=self._frame.select_positions(keep))

    def rename(self, mapping) -> "DataFrame":
        fr = self._frame
        if callable(mapping):
            new = [mapping(str(c)) for c in fr.columns]
        else:
            new = [mapping.get(str(c), str(c)) for c in fr.columns]
        return DataFrame(_frame=fr.set_labels(new))

    def drop_nulls(self, subset=None) -> "DataFrame":
        fr = self._frame
        cols = (fr.data_cols if subset is None
                else [fr.data_cols[i] for i in fr.positions_of(
                    [subset] if isinstance(subset, str) else list(subset))])
        cond = None
        for c in cols:
            e = F.col(c).isNotNull()
            cond = e if cond is None else (cond & e)
        return DataFrame(_frame=fr.filter(cond))

    def fill_null(self, value) -> "DataFrame":
        fr = self._frame
        return DataFrame(_frame=fr.project(
            [str(c) for c in fr.columns],
            [F.coalesce(fr.scol(i), F.lit(value)) for i in range(len(fr.columns))]))

    def reverse(self) -> "DataFrame":
        fr = self._frame.ensure_order()
        sdf = fr.sdf.withColumn(ORDER_COL, -F.col(ORDER_COL).cast("decimal(38,0)"))
        return DataFrame(_frame=fr._same_rows(sdf))

    def vstack(self, other: "DataFrame") -> "DataFrame":
        from modin_spark.core import compiler as qc

        return DataFrame(_frame=qc.concat_rows([self._frame, other._frame],
                                               join="outer", ignore_index=True))

    def hstack(self, columns) -> "DataFrame":
        from modin_spark.core import compiler as qc

        frames = [self._frame] + [
            (c._to_frame() if isinstance(c, Series) else c._frame) for c in columns]
        return DataFrame(_frame=qc.concat_cols(frames, join="outer"))

    def unpivot(self, on=None, index=None, variable_name: str = "variable",
                value_name: str = "value") -> "DataFrame":
        import modin_spark.pandas as mpd

        idx = [index] if isinstance(index, str) else (list(index) if index else [])
        val = [on] if isinstance(on, str) else (list(on) if on else
                                                [c for c in self.columns if c not in idx])
        pdf = mpd.DataFrame(_frame=self._frame)
        out = mpd.melt(pdf, id_vars=idx or None, value_vars=val,
                       var_name=variable_name, value_name=value_name)
        return DataFrame(_frame=out._frame)

    melt = unpivot

    def pivot(self, on, *, index, values, aggregate_function: str = "first") -> "DataFrame":
        import modin_spark.pandas as mpd

        pdf = mpd.DataFrame(_frame=self._frame)
        out = pdf.pivot_table(index=index, columns=on, values=values,
                              aggfunc=aggregate_function).reset_index()
        return DataFrame(_frame=out._frame)

    def partition_by(self, *by, as_dict: bool = False):
        keys = []
        for b in by:
            keys.extend(b if isinstance(b, (list, tuple)) else [b])
        fr = self._frame
        kcols = [fr.data_cols[i] for i in fr.positions_of(keys)]
        groups = [tuple(r) for r in fr.sdf.select(*kcols).distinct().collect()]
        parts = {}
        for g in groups:
            cond = None
            for c, v in zip(kcols, g):
                e = F.col(c).eqNullSafe(F.lit(v))
                cond = e if cond is None else (cond & e)
            parts[g if len(g) > 1 else g[0]] = DataFrame(_frame=fr.filter(cond))
        return parts if as_dict else list(parts.values())

    # ------------------------------------------------------------ reductions
    def _agg_all(self, sfn) -> "DataFrame":
        fr = self._frame
        phys = fresh_names(len(fr.data_cols))
        sdf = fr.sdf.agg(*[sfn(fr.scol(i)).alias(p) for i, p in enumerate(phys)])
        sdf = sdf.withColumn(ORDER_COL, F.lit(0).cast("long"))
        return DataFrame(_frame=SparkFrame(sdf, fr.columns, phys, [], [None]))

    def sum(self):  # noqa: A003
        return self._agg_all(F.sum)

    def mean(self):
        return self._agg_all(F.avg)

    def min(self):  # noqa: A003
        return self._agg_all(F.min)

    def max(self):  # noqa: A003
        return self._agg_all(F.max)

    def median(self):
        return self._agg_all(F.median)

    def std(self, ddof: int = 1):
        return self._agg_all(F.stddev_samp if ddof == 1 else F.stddev_pop)

    def var(self, ddof: int = 1):
        return self._agg_all(F.var_samp if ddof == 1 else F.var_pop)

    def null_count(self) -> "DataFrame":
        return self._agg_all(lambda c: F.sum(F.when(c.isNull(), 1).otherwise(0)))

    def n_unique(self, subset=None) -> int:
        fr = self._frame
        cols = (fr.data_cols if subset is None
                else [fr.data_cols[i] for i in fr.positions_of(
                    [subset] if isinstance(subset, str) else list(subset))])
        return fr.sdf.select(*cols).distinct().count()

    # ----------------------------------------------------------- conversion
    def to_pandas(self) -> pd.DataFrame:
        return self._frame.to_pandas().reset_index(drop=True)

    def get_column(self, name: str) -> "Series":
        pos = self._frame.positions_of([name])[0]
        return Series(_frame=self._frame.select_positions([pos]))

    def to_series(self, index: int = 0) -> "Series":
        return Series(_frame=self._frame.select_positions([index]))

    def get_columns(self) -> list["Series"]:
        return [self.get_column(c) for c in self.columns]

    def item(self, row: int | None = None, column=None):
        pdf = self.to_pandas()
        if row is None and column is None:
            assert pdf.size == 1, "item() on a non-1x1 frame needs row/column"
            return pdf.iloc[0, 0]
        c = column if isinstance(column, int) else list(pdf.columns).index(column)
        return pdf.iloc[row, c]

    def rows(self, *, named: bool = False):
        pdf = self.to_pandas()
        if named:
            return pdf.to_dict("records")
        return list(pdf.itertuples(index=False, name=None))

    def to_dict(self, *, as_series: bool = False) -> dict:
        pdf = self.to_pandas()
        return {c: (Series(values=pdf[c]) if as_series else pdf[c].tolist())
                for c in pdf.columns}

    def to_dicts(self) -> list[dict]:
        return self.rows(named=True)

    def iter_rows(self, *, named: bool = False):
        return iter(self.rows(named=named))

    def pipe(self, function, *args, **kwargs):
        return function(self, *args, **kwargs)

    def sql(self, query: str, *, table_name: str = "self") -> "DataFrame":
        sdf = self._frame.to_spark(include_index=False, ordered=True)
        sdf.createOrReplaceTempView(table_name)
        out = sdf.sparkSession.sql(query)
        return DataFrame(_frame=SparkFrame.from_spark(out))

    def lazy(self) -> "LazyFrame":
        return LazyFrame(self)

    def clone(self) -> "DataFrame":
        return DataFrame(_frame=self._frame)

    def is_empty(self) -> bool:
        return self._frame.sdf.limit(1).count() == 0

    def slice(self, offset: int, length: int | None = None) -> "DataFrame":  # noqa: A003
        stop = (offset + length) if length is not None else (1 << 62)
        return DataFrame(_frame=self._frame.slice_positions(offset, stop, 1))

    def explode(self, *columns) -> "DataFrame":
        import modin_spark.pandas as mpd

        pdf = mpd.DataFrame(_frame=self._frame)
        cols = []
        for c in columns:
            cols.extend(c if isinstance(c, (list, tuple)) else [c])
        out = pdf.explode(cols if len(cols) > 1 else cols[0])
        return DataFrame(_frame=out._frame.reset_index_frame(drop=True)
                         if hasattr(out._frame, "reset_index_frame") else out._frame)

    def describe(self) -> "DataFrame":
        import modin_spark.pandas as mpd

        out = mpd.DataFrame(_frame=self._frame).describe().reset_index()
        out = out.rename(columns={"index": "statistic"})
        return DataFrame(_frame=out._frame)


class GroupBy:
    """polars group_by (reference: modin/polars/groupby.py). Compiles to ONE
    Spark hash aggregate; agg expressions evaluate against the grouped frame."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def agg(self, *exprs, **named_exprs) -> DataFrame:
        es = _as_exprs(exprs, named_exprs)
        fr = self._df._frame
        kcols = [fr.data_cols[i] for i in fr.positions_of(self._keys)]
        names = []
        aggs = []
        phys = fresh_names(len(es))
        for e, p in zip(es, phys):
            c = e._col(fr)
            if not e._agg:
                # bare col in agg: polars collects the group's values
                c = F.collect_list(c)
            aggs.append(c.alias(p))
            names.append(e._name or p)
        sdf = fr.sdf.groupBy(*[F.col(k).alias(k) for k in kcols]).agg(*aggs)
        sdf = sdf.withColumn(ORDER_COL, F.monotonically_increasing_id())
        cols = pd.Index(list(self._keys) + names)
        return DataFrame(_frame=SparkFrame(sdf, cols, kcols + list(phys), [], [None]))

    def _all(self, sfn) -> DataFrame:
        fr = self._df._frame
        kset = set(self._keys)
        es = [getattr(col(c), sfn)() for c in self._df.columns if c not in kset]
        return self.agg(*es)

    def sum(self):  # noqa: A003
        return self._all("sum")

    def mean(self):
        return self._all("mean")

    def min(self):  # noqa: A003
        return self._all("min")

    def max(self):  # noqa: A003
        return self._all("max")

    def median(self):
        return self._all("median")

    def count(self):
        from modin_spark.polars.expr import len as _len

        return self.agg(_len().alias("count"))

    def n_unique(self):
        return self._all("n_unique")

    def first(self):
        return self._all("first")

    def last(self):
        return self._all("last")

    def len(self, name: str = "len") -> DataFrame:  # noqa: A003
        from modin_spark.polars.expr import len as _len

        return self.agg(_len().alias(name))


class LazyFrame:
    """polars LazyFrame (reference: modin/polars/lazyframe.py). The Spark
    engine is ALREADY lazy — every DataFrame verb builds a Catalyst plan and
    nothing executes until materialization — so LazyFrame is a tag that
    delegates verbs and makes collect() explicit."""

    def __init__(self, df: DataFrame):
        self._df = df

    def collect(self) -> DataFrame:
        return self._df

    def fetch(self, n: int = 500) -> DataFrame:
        return self._df.head(n)

    def __getattr__(self, name):
        attr = getattr(self._df, name)
        if callable(attr):
            def wrapped(*a, **k):
                out = attr(*a, **k)
                if isinstance(out, DataFrame):
                    return LazyFrame(out)
                if isinstance(out, GroupBy):
                    return _LazyGroupBy(out)
                return out
            return wrapped
        return attr


class _LazyGroupBy:
    """group_by on a LazyFrame: agg returns a LazyFrame (polars LazyGroupBy)."""

    def __init__(self, g: "GroupBy"):
        self._g = g

    def __getattr__(self, name):
        attr = getattr(self._g, name)
        if callable(attr):
            def wrapped(*a, **k):
                out = attr(*a, **k)
                return LazyFrame(out) if isinstance(out, DataFrame) else out
            return wrapped
        return attr


class Series:
    """polars Series (reference: modin/polars/series.py) — a 1-column frame."""

    def __init__(self, name=None, values=None, *, _frame: SparkFrame | None = None):
        if _frame is not None:
            self._frame = _frame
            return
        if values is None and name is not None and not isinstance(name, str):
            name, values = None, name
        ps = pd.Series(list(values) if not isinstance(values, pd.Series) else values,
                       name=name if name is not None else "")
        self._frame = SparkFrame.from_pandas(ps.reset_index(drop=True).to_frame())

    @property
    def name(self) -> str:
        return str(self._frame.columns[0])

    @property
    def dtype(self) -> str:
        return self._frame.dtype_of(0)

    def __len__(self) -> int:
        return self._frame.count_rows()

    len = __len__  # noqa: A003

    def _to_frame(self) -> SparkFrame:
        return self._frame

    def to_pandas(self) -> pd.Series:
        return self._frame.to_pandas().iloc[:, 0]

    def to_list(self) -> list:
        return self.to_pandas().tolist()

    def to_frame(self, name: str | None = None) -> DataFrame:
        fr = self._frame
        if name:
            fr = fr.set_labels([name])
        return DataFrame(_frame=fr)

    def _scalar(self, sfn):
        row = self._frame.sdf.agg(sfn(self._frame.scol(0)).alias("r")).collect()[0]
        return row["r"]

    def sum(self):  # noqa: A003
        return self._scalar(F.sum)

    def mean(self):
        return self._scalar(F.avg)

    def min(self):  # noqa: A003
        return self._scalar(F.min)

    def max(self):  # noqa: A003
        return self._scalar(F.max)

    def median(self):
        return self._scalar(F.median)

    def n_unique(self) -> int:
        return self._frame.sdf.select(self._frame.data_cols[0]).distinct().count()

    def unique(self) -> "Series":
        fr = self._frame
        return Series(_frame=fr._subset_rows(fr.sdf.dropDuplicates([fr.data_cols[0]])))

    def head(self, n: int = 5) -> "Series":
        return Series(_frame=self._frame.head(n))

    def alias(self, name: str) -> "Series":
        return Series(_frame=self._frame.set_labels([name]))

    def item(self):
        vals = self.to_list()
        assert len(vals) == 1
        return vals[0]


# ------------------------------------------------------------------ toplevel
def from_pandas(pdf: pd.DataFrame) -> DataFrame:
    return DataFrame(pdf)


def read_parquet(source) -> DataFrame:
    from modin_spark.session import get_spark

    paths = source if isinstance(source, (list, tuple)) else [source]
    return DataFrame(_frame=SparkFrame.from_spark(get_spark().read.parquet(*[str(p) for p in paths])))


def read_csv(source, *, separator: str = ",", has_header: bool = True) -> DataFrame:
    from modin_spark.session import get_spark

    sdf = (get_spark().read.option("sep", separator).option("header", has_header)
           .option("inferSchema", True).csv(str(source)))
    return DataFrame(_frame=SparkFrame.from_spark(sdf))


def scan_parquet(source) -> LazyFrame:
    return LazyFrame(read_parquet(source))


def scan_csv(source, **kw) -> LazyFrame:
    return LazyFrame(read_csv(source, **kw))


def concat(items: Iterable, how: str = "vertical") -> DataFrame:
    from modin_spark.core import compiler as qc

    items = list(items)
    if how in ("vertical", "diagonal"):
        return DataFrame(_frame=qc.concat_rows(
            [d._frame for d in items],
            join="outer" if how == "diagonal" else "inner", ignore_index=True))
    if how == "horizontal":
        return DataFrame(_frame=qc.concat_cols([d._frame for d in items], join="outer"))
    raise NotImplementedError(f"concat how={how!r}")
