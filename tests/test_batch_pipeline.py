"""Batch pipeline API parity (reference:
modin/experimental/batch/pipeline.py; reference tests:
modin/tests/experimental/test_pipeline.py behaviors)."""

import pandas as pd
import pytest


@pytest.fixture()
def mpd(spark):
    import modin_spark.pandas as mpd

    return mpd


def test_pipeline_chain_and_outputs(mpd):
    from modin_spark.experimental import PandasQueryPipeline

    pdf = pd.DataFrame({"a": range(20), "b": [float(i) * 2 for i in range(20)]})
    p = PandasQueryPipeline(mpd.from_pandas(pdf), num_partitions=4)
    p.add_query(lambda df: df.assign(c=df.a + df.b))
    p.add_query(lambda df: df[df.c % 3 != 0], is_output=True)
    p.add_query(lambda df: df.assign(d=df.c * 2), is_output=True)
    outs = p.compute_batch()
    assert len(outs) == 2
    want1 = pdf.assign(c=pdf.a + pdf.b)
    want1 = want1[want1.c % 3 != 0].reset_index(drop=True)
    got1 = outs[0].to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(got1, want1)
    got2 = outs[1].to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want1.assign(d=want1.c * 2))


def test_pipeline_output_ids_and_postprocessor(mpd):
    from modin_spark.experimental import PandasQueryPipeline

    d = mpd.from_pandas(pd.DataFrame({"a": range(10)}))
    p = PandasQueryPipeline(d, num_partitions=2)
    p.add_query(lambda df: df.assign(c=df.a + 1), is_output=True, output_id=7)
    outs = p.compute_batch(
        postprocessor=lambda df, oid, pid: df.assign(oid=oid, pid=pid),
        pass_partition_id=True, pass_output_id=True,
    )
    o7 = outs[7].to_pandas()
    assert set(o7["oid"]) == {7} and o7["a"].tolist() == list(range(10))


def test_pipeline_fan_out_reduce(mpd):
    from modin_spark.experimental import PandasQueryPipeline

    p = PandasQueryPipeline(mpd.from_pandas(pd.DataFrame({"x": [1.0, 2.0]})), num_partitions=3)
    p.add_query(
        lambda df, pid: df.assign(x=df.x * (pid + 1)),
        fan_out=True, pass_partition_id=True,
        reduce_fn=lambda df: pd.DataFrame({"s": [df.x.sum()]}),
        is_output=True,
    )
    outs = p.compute_batch()
    assert outs[0].to_pandas()["s"].tolist() == [18.0]  # 3 * (1+2+3)


def test_pipeline_validation_and_update_df(mpd):
    from modin_spark.experimental import PandasQueryPipeline

    d = mpd.from_pandas(pd.DataFrame({"a": [1, 2]}))
    p = PandasQueryPipeline(d)
    with pytest.raises(ValueError):
        p.add_query(lambda df: df, output_id=1)  # non-output with id
    p.add_query(lambda df: df, is_output=True, output_id=1)
    with pytest.raises(ValueError):
        p.add_query(lambda df: df, is_output=True)  # mixed id / no-id
    with pytest.warns(UserWarning):
        assert PandasQueryPipeline(d).compute_batch() == []
    p2 = PandasQueryPipeline(d)
    p2.add_query(lambda df: df, is_output=True)
    with pytest.raises(ValueError):
        p2.compute_batch(pass_output_id=True)
    p2.update_df(mpd.from_pandas(pd.DataFrame({"a": [9]})))
    assert p2.compute_batch()[0].to_pandas()["a"].tolist() == [9]
