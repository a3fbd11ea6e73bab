"""Experimental surfaces (reference: modin/experimental)."""

from modin_spark.experimental.batch import PandasQuery, PandasQueryPipeline
from modin_spark.experimental.sklearn import train_test_split
from modin_spark.experimental.torch import ModinDataLoader

__all__ = ["PandasQuery", "PandasQueryPipeline", "train_test_split",
           "ModinDataLoader"]
