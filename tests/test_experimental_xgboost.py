"""Experimental xgboost surface (reference: modin/experimental/xgboost).
xgboost itself is absent in this environment: the Spark-side plumbing
(DMatrix schema, feature assembly, label routing) is tested for real;
train/predict assert the clear ImportError degradation."""
import warnings

import pandas as pd
import pytest

import modin_spark.pandas as mpd
from modin_spark.experimental import xgboost as mxgb

warnings.filterwarnings("ignore")


def test_dmatrix_plumbing(spark):
    df = mpd.DataFrame({"f1": [1.0, 2.0, 3.0], "f2": [0.5, 0.25, 0.125]})
    y = mpd.Series([0.0, 1.0, 0.0], name="y")
    dm = mxgb.DMatrix(df, label=y)
    assert dm.num_col == 2
    assert dm.num_row() == 3
    assert dm.feature_names == ["f1", "f2"]
    sdf = dm.to_spark()
    assert sdf.columns == ["features", "label"]
    rows = sdf.collect()
    assert len(rows) == 3
    assert sorted(r["label"] for r in rows) == [0.0, 0.0, 1.0]
    assert all(len(r["features"]) == 2 for r in rows)
    # unlabeled matrix: features only
    dm2 = mxgb.DMatrix(df)
    assert mxgb.DMatrix(df).to_spark().columns == ["features"]
    assert dm2.get_dmatrix_params()["feature_names"] == ["f1", "f2"]


def test_train_requires_xgboost():
    df = mpd.DataFrame({"f1": [1.0, 2.0]})
    dm = mxgb.DMatrix(df, label=mpd.Series([0.0, 1.0]))
    with pytest.raises(ImportError, match="xgboost"):
        mxgb.train({"objective": "reg:squarederror"}, dm)
    with pytest.raises(ImportError, match="xgboost"):
        mxgb.Booster().predict(dm)


def test_dmatrix_rejects_raw_pandas():
    with pytest.raises(AssertionError):
        mxgb.DMatrix(pd.DataFrame({"a": [1]}))
