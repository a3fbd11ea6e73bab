from modin_spark.core.frame import SparkFrame

__all__ = ["SparkFrame"]
