"""Extension registration API — attach custom accessors/methods to the
modin_spark pandas surface (same registration surface as the reference's
``modin/pandas/api/extensions/extensions.py``, minus its per-backend
dispatch, which has no analogue here: there is exactly one engine).

A registered value may be:
- a class (accessor): instantiated lazily per object and cached, pandas
  ``register_*_accessor`` style — ``@register_dataframe_accessor("geo")``
  then ``df.geo.area()``;
- a plain function: attached as a METHOD (``df.total()``), matching the
  reference's non-class registration behavior;
- a property: attached as-is.
"""

from __future__ import annotations

from typing import Any


class _CachedAccessor:
    """Lazy per-instance accessor (pandas _register_accessor semantics):
    the accessor class is constructed with the parent object on first
    attribute access and cached on the instance."""

    def __init__(self, name: str, accessor: type):
        self._name = name
        self._accessor = accessor

    def __get__(self, obj, cls):
        if obj is None:
            return self._accessor
        acc = self._accessor(obj)
        try:
            object.__setattr__(obj, self._name, acc)
        except AttributeError:
            pass  # instances with __slots__ fall back to re-instantiation
        return acc


def _register(cls: type):
    def decorator_factory(name: str):
        def decorator(value: Any):
            if isinstance(value, type):
                setattr(cls, name, _CachedAccessor(name, value))
            elif isinstance(value, property):
                setattr(cls, name, value)
            else:
                setattr(cls, name, value)  # plain function -> method
            return value

        return decorator

    return decorator_factory


def register_dataframe_accessor(name: str):
    """Register an accessor class / method under ``DataFrame.<name>``."""
    from modin_spark.pandas.dataframe import DataFrame

    return _register(DataFrame)(name)


def register_series_accessor(name: str):
    """Register an accessor class / method under ``Series.<name>``."""
    from modin_spark.pandas.series import Series

    return _register(Series)(name)


def register_base_accessor(name: str):
    """Register on BOTH DataFrame and Series (the reference's
    BasePandasDataset has no analogue class here)."""
    from modin_spark.pandas.dataframe import DataFrame
    from modin_spark.pandas.series import Series

    def decorator(value: Any):
        _register(DataFrame)(name)(value)
        _register(Series)(name)(value)
        return value

    return decorator


def register_dataframe_groupby_accessor(name: str):
    from modin_spark.pandas.groupby import DataFrameGroupBy

    return _register(DataFrameGroupBy)(name)


def register_series_groupby_accessor(name: str):
    from modin_spark.pandas.groupby import SeriesGroupBy

    return _register(SeriesGroupBy)(name)


def register_pd_accessor(name: str):
    """Register a name on the ``modin_spark.pandas`` module namespace
    (e.g. a custom top-level reader)."""
    import modin_spark.pandas as mpd

    def decorator(value: Any):
        setattr(mpd, name, value)
        return value

    return decorator
