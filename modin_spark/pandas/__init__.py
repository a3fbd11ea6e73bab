"""modin_spark.pandas — the user-facing pandas-style namespace.

    import modin_spark.pandas as mpd
    df = mpd.read_parquet(".../lineitem.parquet")
    out = df[df.l_quantity > 24].groupby("l_returnflag").agg({"l_extendedprice": "sum"})
"""

from modin_spark.pandas.dataframe import DataFrame
from modin_spark.pandas.series import Series
from modin_spark.pandas.general import (
    concat,
    crosstab,
    cut,
    get_dummies,
    isna,
    melt,
    merge,
    merge_asof,
    merge_ordered,
    notna,
    pivot_table,
    qcut,
    sql,
    to_datetime,
    to_numeric,
    unique,
    value_counts,
    wide_to_long,
)
from modin_spark.pandas.io import (
    from_arrow,
    from_map,
    read_table,
    from_partitions,
    unwrap_partitions,
    from_pandas,
    json_normalize,
    from_spark,
    read_csv,
    read_excel,
    read_feather,
    read_fwf,
    read_html,
    read_json,
    read_orc,
    read_parquet,
    read_pickle,
    read_sql,
    read_table,
    read_xml,
)

isnull = isna
notnull = notna

__all__ = [
    "DataFrame",
    "Series",
    "concat",
    "crosstab",
    "cut",
    "get_dummies",
    "isna",
    "isnull",
    "melt",
    "merge",
    "merge_asof",
    "merge_ordered",
    "notna",
    "notnull",
    "pivot_table",
    "qcut",
    "sql",
    "to_datetime",
    "to_numeric",
    "unique",
    "value_counts",
    "wide_to_long",
    "from_arrow",
    "from_map",
    "read_table",
    "from_partitions",
    "unwrap_partitions",
    "from_pandas",
    "from_spark",
    "read_csv",
    "read_excel",
    "read_feather",
    "read_fwf",
    "read_html",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_pickle",
    "read_sql",
    "read_table",
    "read_xml",
    "json_normalize",
]
