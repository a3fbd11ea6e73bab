"""User-facing configuration knobs, drop-in for ``modin.config``.

A porting user's first lines are often ``from modin.config import Engine,
NPartitions, BenchmarkMode`` (reference surface:
modin/config/__init__.py, modin/config/envvars.py:195 Engine, :837
NPartitions, :950 BenchmarkMode, :1265 RangePartitioning, :654
AutoSwitchBackend, :1357 NativePandasMaxRows; pub-sub contract
modin/config/pubsub.py:195-420). This module re-expresses that contract
Spark-first: every knob is a class with ``get/put/get_help/
get_value_source/subscribe/once`` initialized from its ``MODIN_*``
environment variable, and the knobs that have a real Spark analog write
through to it —

- ``NPartitions``      -> ``spark.sql.shuffle.partitions`` (live session
                          conf when one is active, remembered for later
                          sessions otherwise)
- ``CpuCount``         -> local[...] core budget (informational)
- ``NativePandasMaxRows``/``AutoSwitchBackend`` -> the deferred-native
                          small-frame threshold (core.frame.native_max_rows)
- ``BenchmarkMode``    -> eager execution: materialize each new frame so
                          wall-clock timing brackets real work
- ``RangePartitioning``/``DynamicPartitioning`` -> accepted, advisory:
                          Catalyst + AQE already choose shuffle strategy

Engine/StorageFormat/Backend accept the reference's spellings so scripts
run unmodified; a non-Spark engine is stored but execution stays on Spark
(a UserWarning says so).
"""

from __future__ import annotations

import contextlib
import os
import warnings
from enum import IntEnum
from typing import Any, Callable

_UNSET = object()

# read by core.frame at frame-construction time (kept a plain module global
# so the hot path pays one attribute read, not a Parameter.get())
_benchmark_on = False


class ValueSource(IntEnum):
    DEFAULT = 0
    GOT_FROM_CFG_SOURCE = 1
    SET_BY_USER = 2


def _to_bool(v: Any) -> bool:
    if isinstance(v, str):
        return v.strip().lower() in ("true", "yes", "t", "y", "1")
    return bool(v)


class Parameter:
    """One configuration knob: class-level value + env default + pub-sub."""

    type: type = str
    varname: str | None = None
    default: Any = None
    choices: tuple | None = None

    _value: Any = _UNSET
    _value_source: ValueSource = ValueSource.DEFAULT

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        cls._value = _UNSET
        cls._value_source = ValueSource.DEFAULT
        cls._subs: list[Callable] = []
        cls._once: dict[Any, list[Callable]] = {}

    # -- value plumbing ----------------------------------------------------
    @classmethod
    def _get_default(cls) -> Any:
        return cls.default

    @classmethod
    def normalize(cls, value: Any) -> Any:
        if value is None:
            # None is "unset", not a value to coerce — str(None) would turn
            # a default-None str param into the literal 'None'
            return None
        if cls.type is bool:
            return _to_bool(value)
        if cls.type is int:
            return int(value)
        if cls.type is dict and isinstance(value, str):
            out = {}
            for part in value.split(","):
                if part:
                    k, _, v = part.partition("=")
                    out[k.strip()] = int(v) if v.strip().isdigit() else v.strip()
            return out
        if cls.type is str and isinstance(value, str) and cls.choices:
            for c in cls.choices:  # case-insensitive like the reference
                if value.lower() == c.lower():
                    return c
        return cls.type(value) if cls.type in (str,) else value

    @classmethod
    def _verify(cls, value: Any) -> Any:
        value = cls.normalize(value)
        if cls.choices is not None and value not in cls.choices:
            raise ValueError(
                f"Unsupported value for {cls.__name__}: {value!r} "
                f"(choices: {', '.join(map(str, cls.choices))})")
        return value

    @classmethod
    def get(cls) -> Any:
        if cls._value is _UNSET:
            env = os.environ.get(cls.varname) if cls.varname else None
            if env is not None:
                cls._value = cls._verify(env)
                cls._value_source = ValueSource.GOT_FROM_CFG_SOURCE
                # env vars are the reference's PRIMARY config interface —
                # fire the write-through hook exactly as put() would, so
                # MODIN_BENCHMARK_MODE / MODIN_NPARTITIONS etc. take effect.
                # Re-entrancy is safe: _value is already set, so any get()
                # from inside the hook returns immediately.
                cls._on_put(cls._value)
            else:
                cls._value = cls._get_default()
                cls._value_source = ValueSource.DEFAULT
        return cls._value

    @classmethod
    def put(cls, value: Any) -> None:
        value = cls._verify(value)
        old, cls._value = cls.get(), value
        cls._value_source = ValueSource.SET_BY_USER
        cls._on_put(value)
        if value != old:
            for cb in cls._subs:
                cb(cls)
            for cb in cls._once.pop(value, []):
                cb(cls)

    @classmethod
    def _on_put(cls, value: Any) -> None:
        """Spark write-through hook; default none."""

    @classmethod
    def get_value_source(cls) -> ValueSource:
        cls.get()
        return cls._value_source

    @classmethod
    def get_help(cls) -> str:
        doc = (cls.__doc__ or "").strip().splitlines()
        head = doc[0] if doc else ""
        extra = f" (env: {cls.varname})" if cls.varname else ""
        return f"{cls.__name__}: {head}{extra}"

    @classmethod
    def subscribe(cls, callback: Callable) -> None:
        cls._subs.append(callback)
        callback(cls)

    @classmethod
    def once(cls, onvalue: Any, callback: Callable) -> None:
        onvalue = cls.normalize(onvalue)
        if onvalue == cls.get():
            callback(cls)
        else:
            cls._once.setdefault(onvalue, []).append(callback)


class EnvironmentVariable(Parameter):
    """Alias kept so ``from modin.config import EnvironmentVariable`` ports."""


def _active_session():
    try:
        from pyspark.sql import SparkSession

        return SparkSession.getActiveSession()
    except Exception:
        return None


# --------------------------------------------------------------------------
# general settings
# --------------------------------------------------------------------------

class IsDebug(Parameter):
    """Force debug (single-threaded) semantics; advisory under Spark."""
    type = bool
    varname = "MODIN_DEBUG"
    default = False


class Engine(Parameter):
    """Distribution engine to run queries by; always Spark here."""
    type = str
    varname = "MODIN_ENGINE"
    default = "Spark"
    choices = ("Spark", "Ray", "Dask", "Python", "Unidist", "Native")
    NOINIT_ENGINES = {"Spark", "Python", "Native"}
    has_custom_engine = False

    @classmethod
    def _on_put(cls, value: str) -> None:
        if value not in ("Spark", "Native", "Python"):
            warnings.warn(
                f"Engine.put({value!r}) accepted for script compatibility, "
                "but modin_spark always executes on Spark", UserWarning)

    @classmethod
    def add_option(cls, name: str) -> str:
        cls.choices = tuple(list(cls.choices) + [name])
        cls.has_custom_engine = True
        return name


class StorageFormat(Parameter):
    """Storage format backing the dataframe; Spark columnar here."""
    type = str
    varname = "MODIN_STORAGE_FORMAT"
    default = "Spark"
    choices = ("Spark", "Pandas", "Native")


class Backend(Parameter):
    """(engine, storage) pair alias; Spark here."""
    type = str
    varname = "MODIN_BACKEND"
    default = "Spark"
    choices = ("Spark", "Ray", "Dask", "Python_Test", "Pandas", "Unidist")

    @classmethod
    def _on_put(cls, value: str) -> None:
        if value not in ("Spark", "Pandas"):
            warnings.warn(
                f"Backend.put({value!r}) accepted for script compatibility, "
                "but modin_spark always executes on Spark", UserWarning)

    @classmethod
    def get_active_backends(cls):
        return ("Spark", "Pandas")


class CpuCount(Parameter):
    """How many CPU cores to use during initialization."""
    type = int
    varname = "MODIN_CPUS"

    @classmethod
    def _get_default(cls) -> int:
        return os.cpu_count() or 1


class GpuCount(Parameter):
    """How many GPU devices to utilize across the whole distribution."""
    type = int
    varname = "MODIN_GPUS"
    default = 0


class Memory(Parameter):
    """How much memory (in bytes) give to an execution engine."""
    type = int
    varname = "MODIN_MEMORY"
    default = 0


class NPartitions(Parameter):
    """Shuffle/partition budget -> ``spark.sql.shuffle.partitions``."""
    type = int
    varname = "MODIN_NPARTITIONS"

    @classmethod
    def _get_default(cls) -> int:
        sp = _active_session()
        if sp is not None:
            try:
                return int(sp.conf.get("spark.sql.shuffle.partitions"))
            except Exception:
                pass
        return CpuCount.get()

    @classmethod
    def _verify(cls, value: Any) -> int:
        n = super()._verify(value)
        if n <= 0:  # reject BEFORE storing / touching the Spark conf
            raise ValueError(f"`NPartitions` should be > 0; current value: {n}")
        return n

    @classmethod
    def get(cls) -> int:
        n = super().get()
        if n <= 0:
            raise ValueError(f"`NPartitions` should be > 0; current value: {n}")
        return n

    @classmethod
    def _on_put(cls, value: int) -> None:
        os.environ["MODIN_SPARK_SHUFFLE_PARTITIONS"] = str(value)
        sp = _active_session()
        if sp is not None:
            sp.conf.set("spark.sql.shuffle.partitions", str(value))

    @classmethod
    def _put(cls, value: int) -> None:
        # internal setter honored only while the user hasn't chosen
        if cls.get_value_source() == ValueSource.DEFAULT:
            cls.put(value)


class AutoSwitchBackend(Parameter):
    """Automatically switch small frames to the native pandas fast path."""
    type = bool
    varname = "MODIN_AUTO_SWITCH_BACKENDS"
    default = True

    @classmethod
    def _on_put(cls, value: bool) -> None:
        if value:
            os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = str(NativePandasMaxRows.get())
        else:
            os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = "0"

    # reference API (modin/config/envvars.py:654): imperative aliases
    @classmethod
    def enable(cls) -> None:
        cls.put(True)

    @classmethod
    def disable(cls) -> None:
        cls.put(False)


class ShowBackendSwitchProgress(Parameter):
    """Show progress during automatic backend switches; advisory."""
    type = bool
    varname = "MODIN_SHOW_BACKEND_SWITCH_PROGRESS"
    default = True


class NativePandasMaxRows(Parameter):
    """Max rows a frame may have and still use the native pandas path."""
    type = int
    varname = "MODIN_NATIVE_PANDAS_MAX_ROWS"

    @classmethod
    def _get_default(cls) -> int:
        try:
            return int(os.environ.get("MODIN_SPARK_NATIVE_MAX_ROWS", "5000"))
        except ValueError:
            return 5000

    @classmethod
    def _on_put(cls, value: int) -> None:
        if AutoSwitchBackend.get():
            os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = str(value)


class NativePandasTransferThreshold(Parameter):
    """Max bytes to transfer into the native pandas path."""
    type = int
    varname = "MODIN_NATIVE_PANDAS_TRANSFER_THRESHOLD"
    default = 10_000_000


class NativePandasDeepCopy(Parameter):
    """Deep-copy pandas objects entering the native path."""
    type = bool
    varname = "MODIN_NATIVE_PANDAS_DEEP_COPY"
    default = False


class BenchmarkMode(Parameter):
    """Materialize each new frame eagerly so timings bracket real work."""
    type = bool
    varname = "MODIN_BENCHMARK_MODE"
    default = False

    @classmethod
    def _on_put(cls, value: bool) -> None:
        global _benchmark_on
        _benchmark_on = bool(value)


class ProgressBar(Parameter):
    """Show a progress bar; advisory (use the Spark UI)."""
    type = bool
    varname = "MODIN_PROGRESS_BAR"
    default = False

    @classmethod
    def enable(cls) -> None:
        cls.put(True)

    @classmethod
    def disable(cls) -> None:
        cls.put(False)


class RangePartitioning(Parameter):
    """Use range partitioning for groupby/joins; advisory (Catalyst+AQE
    already pick hash vs range vs broadcast per plan)."""
    type = bool
    varname = "MODIN_RANGE_PARTITIONING"
    default = False


class DynamicPartitioning(Parameter):
    """Use dynamic partition sizing; advisory (AQE coalescing is on)."""
    type = bool
    varname = "MODIN_DYNAMIC_PARTITIONING"
    default = False


class MinPartitionSize(Parameter):
    """Minimum block size (rows); maps to Spark input-split sizing."""
    type = int
    varname = "MODIN_MIN_PARTITION_SIZE"
    default = 32


class MinRowPartitionSize(Parameter):
    """Minimum rows per row-block."""
    type = int
    varname = "MODIN_MIN_ROW_PARTITION_SIZE"
    default = 32


class MinColumnPartitionSize(Parameter):
    """Minimum columns per column-block."""
    type = int
    varname = "MODIN_MIN_COLUMN_PARTITION_SIZE"
    default = 32


class ModinNumpy(Parameter):
    """Use the modin.numpy array veneer inside the pandas API."""
    type = bool
    varname = "MODIN_NUMPY"
    default = False


class IsExperimental(Parameter):
    """Turn on experimental features."""
    type = bool
    varname = "MODIN_EXPERIMENTAL"
    default = False


class AsyncReadMode(Parameter):
    """Allow readers to return before data fully lands; Spark reads are
    lazy by construction, so this is inherently True-like and advisory."""
    type = bool
    varname = "MODIN_ASYNC_READ_MODE"
    default = False


class ReadSqlEngine(Parameter):
    """Engine for read_sql distribution."""
    type = str
    varname = "MODIN_READ_SQL_ENGINE"
    default = "Pandas"
    choices = ("Pandas", "Connectorx")


class LazyExecution(Parameter):
    """Lazy execution mode; Spark is always lazy until an action."""
    type = str
    varname = "MODIN_LAZY_EXECUTION"
    default = "Auto"
    choices = ("Auto", "On", "Off")


class PersistentPickle(Parameter):
    """Pickle modin objects by value (self-contained) instead of by ref."""
    type = bool
    varname = "MODIN_PERSISTENT_PICKLE"
    default = False


class DocModule(Parameter):
    """Module to inherit docstrings from."""
    type = str
    varname = "MODIN_DOC_MODULE"
    default = "pandas"


class LogMode(Parameter):
    """Logging mode."""
    type = str
    varname = "MODIN_LOG_MODE"
    default = "disable"
    choices = ("enable", "disable", "enable_api_only")

    @classmethod
    def enable(cls) -> None:
        cls.put("enable")

    @classmethod
    def disable(cls) -> None:
        cls.put("disable")

    @classmethod
    def enable_api_only(cls) -> None:
        cls.put("enable_api_only")


class LogMemoryInterval(Parameter):
    """Seconds between memory-usage log samples."""
    type = int
    varname = "MODIN_LOG_MEMORY_INTERVAL"
    default = 5


class LogFileSize(Parameter):
    """Max size (MB) of one log file."""
    type = int
    varname = "MODIN_LOG_FILE_SIZE"
    default = 10


class MetricsMode(Parameter):
    """Emit API metrics."""
    type = str
    varname = "MODIN_METRICS_MODE"
    default = "enable"
    choices = ("enable", "disable")

    @classmethod
    def enable(cls) -> None:
        cls.put("enable")

    @classmethod
    def disable(cls) -> None:
        cls.put("disable")


class TrackFileLeaks(Parameter):
    """Track open file handles in tests."""
    type = bool
    varname = "MODIN_TEST_TRACK_FILE_LEAKS"
    default = True


class TestDatasetSize(Parameter):
    """Dataset size tier for running some tests."""
    type = str
    varname = "MODIN_TEST_DATASET_SIZE"
    default = "Small"
    choices = ("Small", "Normal", "Big")


class AsvImplementation(Parameter):
    """Implementation to run ASV benchmarks against."""
    type = str
    varname = "MODIN_ASV_USE_IMPL"
    default = "modin"
    choices = ("modin", "pandas")


class AsvDataSizeConfig(Parameter):
    """Override for ASV benchmark data sizes."""
    type = str
    varname = "MODIN_ASV_DATASIZE_CONFIG"
    default = None


class GithubCI(Parameter):
    """Whether running under GitHub CI."""
    type = bool
    varname = "MODIN_GITHUB_CI"
    default = False


class TestReadFromSqlServer(Parameter):
    """Test reads against SQL Server."""
    type = bool
    varname = "MODIN_TEST_READ_FROM_SQL_SERVER"
    default = False


class TestReadFromPostgres(Parameter):
    """Test reads against Postgres."""
    type = bool
    varname = "MODIN_TEST_READ_FROM_POSTGRES"
    default = False


# engine-specific knobs kept for import compatibility (no-ops on Spark)
class IsRayCluster(Parameter):
    type = bool
    varname = "MODIN_RAY_CLUSTER"
    default = False


class RayRedisAddress(Parameter):
    type = str
    varname = "MODIN_REDIS_ADDRESS"
    default = None


class RayRedisPassword(Parameter):
    type = str
    varname = "MODIN_REDIS_PASSWORD"
    default = None


class RayInitCustomResources(Parameter):
    type = dict
    varname = "MODIN_RAY_INIT_CUSTOM_RESOURCES"
    default = None


class RayTaskCustomResources(Parameter):
    type = dict
    varname = "MODIN_RAY_TASK_CUSTOM_RESOURCES"
    default = None


class DaskThreadsPerWorker(Parameter):
    type = int
    varname = "MODIN_DASK_THREADS_PER_WORKER"
    default = 1


class BackendMergeCastInPlace(Parameter):
    type = bool
    varname = "MODIN_BACKEND_MERGE_CAST_IN_PLACE"
    default = True


class BackendJoinConsiderAllBackends(Parameter):
    type = bool
    varname = "MODIN_BACKEND_JOIN_CONSIDER_ALL_BACKENDS"
    default = False


class CIAWSSecretAccessKey(Parameter):
    type = str
    varname = "AWS_SECRET_ACCESS_KEY"
    default = "foobar_secret"


class CIAWSAccessKeyID(Parameter):
    type = str
    varname = "AWS_ACCESS_KEY_ID"
    default = "foobar_key"


class Execution:
    """(storage_format, engine) pair, reference parity."""

    def __init__(self, storage_format: str = "Spark", engine: str = "Spark"):
        self.storage_format = storage_format
        self.engine = engine

    def __iter__(self):
        return iter((self.storage_format, self.engine))

    def __repr__(self):
        return f"Execution(storage_format={self.storage_format!r}, engine={self.engine!r})"


@contextlib.contextmanager
def context(**config: Any):
    """Temporarily set config values (reference: modin/config/pubsub.py:466)."""
    ns = globals()
    saved = []
    try:
        for name, value in config.items():
            param = ns[name]
            saved.append((param, param.get(), param._value_source))
            param.put(value)
        yield
    finally:
        for param, old, src in reversed(saved):
            # direct restore: put() would re-normalize (turning a prior
            # None into the string 'None' for str params), stamp
            # SET_BY_USER, and re-fire subscribers on a mere reset
            param._value = old
            param._value_source = src
            if old is not None:
                # keep write-through state (Spark conf, env mirrors) in
                # sync with the restored value
                param._on_put(old)


__all__ = [
    "EnvironmentVariable", "Parameter", "ValueSource", "context",
    "IsDebug", "Engine", "StorageFormat", "CpuCount", "GpuCount", "Memory",
    "Backend", "BackendJoinConsiderAllBackends", "BackendMergeCastInPlace",
    "Execution", "AutoSwitchBackend", "ShowBackendSwitchProgress",
    "IsRayCluster", "RayRedisAddress", "RayRedisPassword",
    "RayInitCustomResources", "RayTaskCustomResources", "LazyExecution",
    "DaskThreadsPerWorker",
    "NativePandasMaxRows", "NativePandasTransferThreshold",
    "NativePandasDeepCopy",
    "NPartitions", "MinPartitionSize", "MinRowPartitionSize",
    "MinColumnPartitionSize",
    "TestDatasetSize", "AsvImplementation", "AsvDataSizeConfig",
    "TrackFileLeaks", "GithubCI", "TestReadFromSqlServer",
    "TestReadFromPostgres",
    "BenchmarkMode", "ProgressBar", "RangePartitioning",
    "DynamicPartitioning", "ModinNumpy", "IsExperimental", "AsyncReadMode",
    "ReadSqlEngine", "PersistentPickle", "DocModule",
    "LogMode", "LogMemoryInterval", "LogFileSize", "MetricsMode",
]
