"""Experimental surfaces (reference: modin/experimental)."""

from modin_spark.experimental.batch import PandasQuery, PandasQueryPipeline

__all__ = ["PandasQuery", "PandasQueryPipeline"]
