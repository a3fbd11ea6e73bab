"""IO roundtrips: writers feed the matching reader, results compared to the
source frame (reference io surface: modin/core/io — here each maps to the
native parallel Spark source/sink)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def iodf(pdf):
    # drop tz/object edge cases irrelevant to io-path checks, keep mixed types
    return pdf[["a", "b", "k", "t"]].copy()


def _sorted(df):
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def test_parquet_roundtrip(iodf, tmp_path, spark):
    import modin_spark.pandas as mpd

    path = str(tmp_path / "rt.parquet")
    mpd.from_pandas(iodf).to_parquet(path)
    back = mpd.read_parquet(path).to_pandas()
    pd.testing.assert_frame_equal(_sorted(back), _sorted(iodf), check_dtype=False)


def test_csv_roundtrip(iodf, tmp_path, spark):
    import modin_spark.pandas as mpd

    path = str(tmp_path / "rt_csv")
    sub = iodf[["a", "b", "k"]]
    mpd.from_pandas(sub).to_csv(path)
    back = mpd.read_csv(path).to_pandas()
    pd.testing.assert_frame_equal(_sorted(back), _sorted(sub), check_dtype=False)


def test_json_roundtrip(iodf, tmp_path, spark):
    import modin_spark.pandas as mpd

    path = str(tmp_path / "rt_json")
    sub = iodf[["a", "b", "k"]]
    mpd.from_pandas(sub).to_json(path)
    back = mpd.read_json(path).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(back)[["a", "b", "k"]], _sorted(sub), check_dtype=False
    )


def test_orc_roundtrip(iodf, tmp_path, spark):
    import modin_spark.pandas as mpd

    path = str(tmp_path / "rt_orc")
    sub = iodf[["a", "b", "k"]]
    mpd.from_pandas(sub).to_orc(path)
    back = mpd.DataFrame(_frame=__import__("modin_spark.core.frame", fromlist=["SparkFrame"]).SparkFrame.from_spark(
        spark.read.orc(path)
    )).to_pandas()
    pd.testing.assert_frame_equal(_sorted(back), _sorted(sub), check_dtype=False)


def test_from_arrow_from_spark(iodf, spark):
    import pyarrow as pa

    import modin_spark.pandas as mpd

    tbl = pa.Table.from_pandas(iodf[["a", "b", "k"]])
    m = mpd.from_arrow(tbl).to_pandas()
    pd.testing.assert_frame_equal(_sorted(m), _sorted(iodf[["a", "b", "k"]]), check_dtype=False)

    sdf = spark.createDataFrame(iodf[["a", "b", "k"]])
    m2 = mpd.from_spark(sdf).to_pandas()
    pd.testing.assert_frame_equal(_sorted(m2), _sorted(iodf[["a", "b", "k"]]), check_dtype=False)


def test_read_csv_names_sep(tmp_path, spark):
    import modin_spark.pandas as mpd

    p = tmp_path / "x.csv"
    p.write_text("1|a\n2|b\n3|c\n")
    m = mpd.read_csv(str(p), sep="|", names=["n", "s"]).to_pandas()
    assert m["n"].tolist() == [1, 2, 3]
    assert m["s"].tolist() == ["a", "b", "c"]


def test_partition_roundtrip(spark, pdf):
    import modin_spark.pandas as mpd

    parts = [pdf.iloc[:100][["a", "b"]], pdf.iloc[100:][["a", "b"]]]
    m = mpd.from_partitions(parts, axis=0)
    assert len(m) == len(pdf)
    back = mpd.unwrap_partitions(m)
    total = sum(len(p) for p in back)
    assert total == len(pdf)
    joined = pd.concat(back, ignore_index=True)
    assert sorted(joined["a"].tolist()) == sorted(pdf["a"].tolist())


def test_read_parquet_filters_pushdown(spark):
    import modin_spark.pandas as mpd
    from modin_spark import plans

    m = mpd.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
        filters=[("o_orderstatus", "==", "F"), ("o_totalprice", ">", 100000.0)],
    )
    assert plans.has_pushed_filters(m._frame.sdf), plans.physical_plan(m._frame.sdf)
    got = m.to_pandas()
    assert (got["o_orderstatus"] == "F").all()
    assert (got["o_totalprice"] > 100000.0).all()
    # disjunction-of-conjunctions form
    m2 = mpd.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        filters=[[("o_orderstatus", "==", "F")], [("o_orderstatus", "==", "O")]],
    )
    s = set(m2.to_pandas()["o_orderstatus"])
    assert s <= {"F", "O"}


def test_read_feather_parallel(spark, tmp_path):
    """Distributed feather: one task per IPC record batch, schema from the
    footer only; values match pandas."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.ipc as ipc

    import modin_spark.pandas as mpd

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"a": rng.integers(0, 1000, 20000), "b": rng.random(20000)})
    fp = str(tmp_path / "t.feather")
    tbl = pa.Table.from_pandas(pdf)
    with ipc.new_file(fp, tbl.schema) as w:
        for b in tbl.to_batches(max_chunksize=4000):
            w.write_batch(b)
    m = mpd.read_feather(fp)
    assert m._frame.sdf.rdd.getNumPartitions() == 5  # one per batch
    got = m.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, pdf.sort_values(["a", "b"]).reset_index(drop=True), check_dtype=False
    )
    # column pruning + pandas-written (compressed) file
    pdf.to_feather(str(tmp_path / "t2.feather"))
    m2 = mpd.read_feather(str(tmp_path / "t2.feather"), columns=["b"])
    assert list(m2.to_pandas().columns) == ["b"]
    assert len(m2.to_pandas()) == 20000
