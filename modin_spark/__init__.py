"""modin_spark — a PySpark-native analytics engine with the query surface of
modin (pandas API), re-expressed Spark-first.

Layering (mirrors the reference's, see SURVEY.md §7):

    pandas-style API (modin_spark.pandas)        -- argument normalization
      -> SparkQueryCompiler (core.compiler)      -- one method per logical op
        -> SparkFrame (core.frame)               -- pyspark DataFrame + metadata
          -> Catalyst / Tungsten                 -- physical planning (free)

The reference hand-rolls a partition manager + engines
(/root/reference/modin/core/dataframe/pandas/partitioning/partition_manager.py);
here Spark *is* the partition manager, so that whole layer is absent by design.
"""

from modin_spark.session import get_spark, stop_spark
from modin_spark.core.compiler import invalidate_catalog_memo

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "invalidate_catalog_memo", "__version__"]
