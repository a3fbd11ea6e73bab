"""Distributed XGBoost over the Spark engine (reference surface:
modin/experimental/xgboost/xgboost.py:28 DMatrix, :287 Booster, :372 train).

The reference distributes training itself (Rabit actors over Ray
partitions). Spark-first, the idiomatic equivalent is the xgboost.spark
estimator family (SparkXGBRegressor/Classifier) — barrier-mode executors,
Rabit tracker managed by the library, data fed straight from the DataFrame
partitions with no driver materialization. This module keeps the
reference's API shape (DMatrix/train/predict) and compiles it onto
xgboost.spark; `xgboost` is not installed in this environment, so every
entry point degrades to a clear ImportError while the Spark-side plumbing
(feature assembly, schema, column routing) stays real and testable.
"""
from __future__ import annotations

from typing import Dict, Optional

try:  # pragma: no cover - exercised only where xgboost is installed
    import xgboost as _xgb
except ImportError:  # noqa: SIM105
    _xgb = None


def _require_xgboost():
    if _xgb is None:
        raise ImportError(
            "modin_spark.experimental.xgboost requires the `xgboost` package "
            "(>=1.7, for xgboost.spark); it is not installed in this environment"
        )


class DMatrix:
    """Holds references to the DISTRIBUTED feature/label columns.

    Unlike the reference (which unwraps Ray partition handles,
    modin/experimental/xgboost/xgboost.py:79), this keeps one lazy Spark
    plan: a projection of the feature columns plus an optional label column
    — nothing materializes until train()/predict() hand the plan to the
    xgboost.spark estimator.
    """

    def __init__(self, data, label=None, missing=None, silent=False,
                 feature_names=None, feature_types=None,
                 feature_weights=None, enable_categorical=None):
        from modin_spark.pandas.dataframe import DataFrame
        from modin_spark.pandas.series import Series

        assert isinstance(data, DataFrame), (
            f"Type of `data` is {type(data)}, but expected modin_spark DataFrame.")
        if label is not None:
            assert isinstance(label, (DataFrame, Series)), (
                f"Type of `label` is {type(label)}, but expected DataFrame or Series.")
        self._data = data
        self._label = label
        self.missing = missing
        self.feature_names = (list(feature_names) if feature_names is not None
                              else [str(c) for c in data.columns])
        self.feature_types = feature_types
        self.feature_weights = feature_weights

    def __iter__(self):
        yield self._data
        yield self._label

    @property
    def num_col(self) -> int:
        return len(self._data.columns)

    def num_row(self) -> int:
        return len(self._data)

    def get_dmatrix_params(self) -> dict:
        """Driver-side xgboost.DMatrix kwargs (reference parity helper)."""
        return {
            "feature_names": self.feature_names,
            "feature_types": self.feature_types,
            "missing": self.missing,
        }

    def to_spark(self, label_col: str = "label", features_col: str = "features"):
        """The assembled (features vector, label) Spark DataFrame the
        xgboost.spark estimators consume — array<double> feature column
        built JVM-side (F.array), label column appended via the engine's
        aligned setitem. Real and testable without xgboost installed."""
        from pyspark.sql import functions as F

        work = self._data
        if self._label is not None:
            from modin_spark.pandas.dataframe import DataFrame as _DF

            lbl = self._label if not isinstance(self._label, _DF) else self._label[self._label.columns[0]]
            work = _DF(_frame=work._frame)
            work[label_col] = lbl
        sdf = work.to_spark(ordered=False)
        feats = [F.col(str(c)).cast("double") for c in self.feature_names]
        cols = [F.array(*feats).alias(features_col)]
        if self._label is not None:
            cols.append(F.col(label_col).cast("double").alias(label_col))
        return sdf.select(*cols)


class Booster:
    """Trained model wrapper: predict() runs distributed over the engine's
    partitions (xgboost.spark transformer)."""

    def __init__(self, _model=None):
        self._model = _model

    def predict(self, data: DMatrix, **kwargs):
        _require_xgboost()
        sdf = data.to_spark()
        preds = self._model.transform(sdf)
        from modin_spark.core.frame import SparkFrame
        from modin_spark.pandas.series import Series

        out = preds.select(preds["prediction"].alias("prediction"))
        return Series._from_frame(SparkFrame.from_spark(out))


def train(params: Dict, dtrain: DMatrix, *args, evals=(),
          num_actors: Optional[int] = None, evals_result: Optional[Dict] = None,
          **kwargs) -> Booster:
    """Distributed training via xgboost.spark (barrier-mode executors; the
    library runs one Rabit worker per partition — the Spark-native analogue
    of the reference's Rabit-over-Ray actors)."""
    _require_xgboost()
    from xgboost.spark import SparkXGBClassifier, SparkXGBRegressor

    objective = str(params.get("objective", "reg:squarederror"))
    est_cls = SparkXGBClassifier if objective.startswith(("binary", "multi")) else SparkXGBRegressor
    est = est_cls(
        features_col="features", label_col="label",
        num_workers=num_actors or 1,
        **{k: v for k, v in params.items() if k != "objective"},
    )
    model = est.fit(dtrain.to_spark())
    return Booster(_model=model)
