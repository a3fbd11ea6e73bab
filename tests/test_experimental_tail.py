"""Experimental tail veneers: sklearn train_test_split, torch DataLoader,
spreadsheet bridge (reference modin/experimental/{sklearn,torch,spreadsheet})."""
import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd
from modin_spark.experimental.sklearn import train_test_split
from modin_spark.experimental.torch import ModinDataLoader


def test_train_test_split_positional():
    pdf = pd.DataFrame({"a": range(20), "b": range(20, 40)})
    tr, te = train_test_split(mpd.DataFrame(pdf))
    assert len(tr) == 15 and len(te) == 5
    pd.testing.assert_frame_equal(tr.to_pandas(), pdf.iloc[:15], check_dtype=False)
    pd.testing.assert_frame_equal(
        te.to_pandas().reset_index(drop=True),
        pdf.iloc[15:].reset_index(drop=True), check_dtype=False)
    tr2, te2 = train_test_split(mpd.DataFrame(pdf), train_size=0.5)
    assert len(tr2) == 10 and len(te2) == 10


def test_dataloader_sequential_batches():
    pdf = pd.DataFrame({"a": range(10), "b": [float(i) for i in range(10)]})
    dl = ModinDataLoader(mpd.DataFrame(pdf), batch_size=4)
    assert len(dl) == 3
    batches = list(dl)
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    got = np.concatenate(batches)
    assert np.allclose(got.astype(float), pdf.to_numpy().astype(float))


def test_dataloader_features_subset():
    pdf = pd.DataFrame({"a": range(6), "b": range(6), "c": range(6)})
    dl = ModinDataLoader(mpd.DataFrame(pdf), batch_size=3, features=["a", "c"])
    b = next(iter(dl))
    assert b.shape == (3, 2)


def test_spreadsheet_requires_widget():
    from modin_spark.experimental import spreadsheet as sp
    with pytest.raises(ImportError, match="modin_spreadsheet"):
        sp.from_dataframe(mpd.DataFrame({"a": [1]}))
