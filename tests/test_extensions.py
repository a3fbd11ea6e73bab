"""Extension registration API (reference: modin/pandas/api/extensions)."""

import pandas as pd


def test_register_dataframe_accessor_class(spark):
    import modin_spark.pandas as mpd
    from modin_spark.pandas.api.extensions import register_dataframe_accessor

    @register_dataframe_accessor("stats4")
    class Stats:
        def __init__(self, df):
            self._df = df

        def total(self, col):
            return float(self._df[col].sum())

    mdf = mpd.from_pandas(pd.DataFrame({"a": [1.0, 2, 3]}))
    assert mdf.stats4.total("a") == 6.0


def test_register_series_method(spark):
    import modin_spark.pandas as mpd
    from modin_spark.pandas.api.extensions import register_series_accessor

    @register_series_accessor("double4")
    def double4(self):
        return self * 2

    s = mpd.from_pandas(pd.DataFrame({"a": [1.0, 2]})).a
    assert s.double4().to_pandas().tolist() == [2.0, 4.0]


def test_register_pd_accessor(spark):
    import modin_spark.pandas as mpd
    from modin_spark.pandas.api.extensions import register_pd_accessor

    @register_pd_accessor("read_magic4")
    def read_magic4():
        return mpd.from_pandas(pd.DataFrame({"x": [1]}))

    assert mpd.read_magic4().to_pandas()["x"].tolist() == [1]


def test_register_groupby_accessor(spark):
    import modin_spark.pandas as mpd
    from modin_spark.pandas.api.extensions import register_dataframe_groupby_accessor

    @register_dataframe_groupby_accessor("nkeys4")
    def nkeys4(self):
        return len(self._by_pos)

    g = mpd.from_pandas(pd.DataFrame({"k": ["a"], "v": [1]})).groupby("k")
    assert g.nkeys4() == 1
