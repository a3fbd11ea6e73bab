"""modin_spark.config parity (reference: modin/config/__init__.py export
surface, envvars.py knob semantics, pubsub.py get/put/subscribe contract)."""
import os
import warnings

import pandas as pd
import pytest

import modin_spark.config as cfg
import modin_spark.pandas as mpd

warnings.filterwarnings("ignore")

REFERENCE_EXPORTS = [
    # the names a porting user imports from modin.config
    "EnvironmentVariable", "Parameter", "ValueSource", "context",
    "IsDebug", "Engine", "StorageFormat", "CpuCount", "GpuCount", "Memory",
    "Backend", "Execution", "AutoSwitchBackend", "ShowBackendSwitchProgress",
    "IsRayCluster", "RayRedisAddress", "RayRedisPassword", "LazyExecution",
    "DaskThreadsPerWorker", "NativePandasMaxRows",
    "NativePandasTransferThreshold", "NativePandasDeepCopy", "NPartitions",
    "MinPartitionSize", "MinRowPartitionSize", "MinColumnPartitionSize",
    "TestDatasetSize", "TrackFileLeaks", "BenchmarkMode", "ProgressBar",
    "RangePartitioning", "DynamicPartitioning", "ModinNumpy",
    "IsExperimental", "AsyncReadMode", "ReadSqlEngine", "PersistentPickle",
    "DocModule", "LogMode", "LogMemoryInterval", "LogFileSize", "MetricsMode",
]


def test_api_presence():
    missing = [n for n in REFERENCE_EXPORTS if not hasattr(cfg, n)]
    assert not missing, missing


def test_engine_default_and_compat_put():
    assert cfg.Engine.get() == "Spark"
    with pytest.warns(UserWarning):
        cfg.Engine.put("Ray")
    assert cfg.Engine.get() == "Ray"  # stored for script introspection
    cfg.Engine.put("Spark")
    with pytest.raises(ValueError):
        cfg.Engine.put("NotAnEngine")
    # case-insensitive normalization like the reference
    cfg.Engine.put("spark")
    assert cfg.Engine.get() == "Spark"


def test_npartitions_writes_spark_conf(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        cfg.NPartitions.put(8)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
        assert cfg.NPartitions.get() == 8
        assert cfg.NPartitions.get_value_source() == cfg.ValueSource.SET_BY_USER
        with pytest.raises(ValueError):
            cfg.NPartitions.put(0)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        os.environ.pop("MODIN_SPARK_SHUFFLE_PARTITIONS", None)


def test_native_threshold_and_autoswitch():
    from modin_spark.core.frame import native_max_rows

    old = os.environ.get("MODIN_SPARK_NATIVE_MAX_ROWS")
    try:
        cfg.NativePandasMaxRows.put(123)
        assert native_max_rows() == 123
        cfg.AutoSwitchBackend.disable()
        assert native_max_rows() == 0
        cfg.AutoSwitchBackend.enable()
        assert native_max_rows() == 123
    finally:
        if old is None:
            os.environ.pop("MODIN_SPARK_NATIVE_MAX_ROWS", None)
        else:
            os.environ["MODIN_SPARK_NATIVE_MAX_ROWS"] = old


def test_benchmark_mode_eager(spark):
    cfg.BenchmarkMode.put(True)
    try:
        assert cfg._benchmark_on is True
        df = mpd.DataFrame({"a": list(range(10))})
        assert int(df["a"].sum()) == 45
    finally:
        cfg.BenchmarkMode.put(False)
    assert cfg._benchmark_on is False


def test_subscribe_once_and_context():
    seen = []
    cfg.MinPartitionSize.subscribe(lambda p: seen.append(p.get()))
    assert seen == [cfg.MinPartitionSize.get()]  # fired immediately
    cfg.MinPartitionSize.put(64)
    assert seen[-1] == 64
    fired = []
    cfg.MinPartitionSize.once(128, lambda p: fired.append(p.get()))
    assert not fired
    cfg.MinPartitionSize.put(128)
    assert fired == [128]
    cfg.MinPartitionSize.put(32)

    assert cfg.RangePartitioning.get() is False
    with cfg.context(RangePartitioning=True):
        assert cfg.RangePartitioning.get() is True
    assert cfg.RangePartitioning.get() is False


def test_porting_user_smoke(spark):
    """The reference docs' first-script shape runs unmodified."""
    from modin_spark.config import Engine, NPartitions

    Engine.put("Spark")
    NPartitions.put(16)
    try:
        df = mpd.DataFrame({"x": [1, 2, 3], "y": [4.0, 5.0, 6.0]})
        out = df.groupby("x").sum()
        assert len(out.to_pandas()) == 3
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        os.environ.pop("MODIN_SPARK_SHUFFLE_PARTITIONS", None)


def test_env_var_initialization(monkeypatch):
    # a fresh Parameter subclass reads its env var on first get()
    class _Probe(cfg.Parameter):
        type = int
        varname = "MODIN_SPARK_TEST_PROBE"
        default = 7

    assert _Probe.get() == 7

    class _Probe2(cfg.Parameter):
        type = int
        varname = "MODIN_SPARK_TEST_PROBE2"
        default = 7

    monkeypatch.setenv("MODIN_SPARK_TEST_PROBE2", "42")
    assert _Probe2.get() == 42
    assert _Probe2.get_value_source() == cfg.ValueSource.GOT_FROM_CFG_SOURCE
