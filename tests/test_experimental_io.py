"""Experimental glob IO parity (reference: modin/experimental/pandas/io.py)."""

import pandas as pd
import pytest


def test_pickle_glob_roundtrip(spark, tmp_path):
    import modin_spark.pandas as mpd
    from modin_spark.experimental import pandas as xpd

    pdf = pd.DataFrame({"a": range(50), "b": [f"s{i}" for i in range(50)]})
    d = mpd.from_pandas(pdf)
    xpd.to_pickle_glob(d, f"{tmp_path}/part_*.pkl")
    import glob

    files = glob.glob(f"{tmp_path}/part_*.pkl")
    assert len(files) >= 1
    back = xpd.read_pickle_glob(f"{tmp_path}/part_*.pkl").to_pandas()
    assert sorted(back["a"].tolist()) == list(range(50))


def test_read_csv_glob_is_native(spark, tmp_path):
    from modin_spark.experimental import pandas as xpd

    for i in range(3):
        pd.DataFrame({"a": [i * 10 + j for j in range(5)]}).to_csv(tmp_path / f"f{i}.csv", index=False)
    got = xpd.read_csv_glob(f"{tmp_path}/f*.csv").to_pandas()
    assert sorted(got["a"].tolist()) == sorted(i * 10 + j for i in range(3) for j in range(5))


def test_read_custom_text(spark, tmp_path):
    from modin_spark.experimental import pandas as xpd

    for i in range(2):
        (tmp_path / f"t{i}.txt").write_text("\n".join(f"{i}:{j}" for j in range(4)) + "\n")

    def parser(fh):
        rows = [line.strip().split(":") for line in fh if line.strip()]
        return pd.DataFrame(rows)

    got = xpd.read_custom_text(f"{tmp_path}/t*.txt", columns=["file", "val"], custom_parser=parser).to_pandas()
    assert len(got) == 8 and set(got["file"]) == {"0", "1"}


def test_read_pickle_glob_missing(spark, tmp_path):
    from modin_spark.experimental import pandas as xpd

    with pytest.raises(FileNotFoundError):
        xpd.read_pickle_glob(f"{tmp_path}/none_*.pkl")
