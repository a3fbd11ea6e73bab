from modin_spark.pandas.api import extensions

__all__ = ["extensions"]
