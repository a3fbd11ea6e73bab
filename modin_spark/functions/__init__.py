from modin_spark.functions.strings import STR_FUNCS, str_func
from modin_spark.functions.datetimes import DT_FUNCS, dt_func

__all__ = ["STR_FUNCS", "str_func", "DT_FUNCS", "dt_func"]
