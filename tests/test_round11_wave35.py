"""Probe wave 35 (round 11 closer): read_csv comment/quotechar/encoding,
read_parquet path lists, to_json string form. (tools/probe_wave35.py,
15 green)."""

import numpy as np
import pandas as pd
import pytest

import modin_spark.pandas as mpd


def test_read_csv_comment_quotechar_encoding(tmp_path):
    p1 = tmp_path / "c1.csv"
    p1.write_text("# a comment\na,b\n1,2\n# mid\n3,4\n")
    got = mpd.read_csv(str(p1), comment="#").to_pandas().a.sort_values().tolist()
    assert got == pd.read_csv(str(p1), comment="#").a.sort_values().tolist()
    p2 = tmp_path / "c2.csv"
    p2.write_text("a;b\n'x;y';2\n'z';4\n")
    got2 = sorted(mpd.read_csv(str(p2), sep=";", quotechar="'").to_pandas().a)
    assert got2 == sorted(pd.read_csv(str(p2), sep=";", quotechar="'").a)
    p3 = tmp_path / "c3.csv"
    p3.write_bytes("a,b\nü,2\n".encode("latin-1"))
    got3 = mpd.read_csv(str(p3), encoding="latin-1").to_pandas().a.tolist()
    assert got3 == pd.read_csv(str(p3), encoding="latin-1").a.tolist()


def test_read_parquet_path_list(tmp_path):
    p = pd.DataFrame({"a": [1, 2, 3]})
    p.to_parquet(str(tmp_path / "p1.parquet"))
    p.to_parquet(str(tmp_path / "p2.parquet"))
    got = mpd.read_parquet([str(tmp_path / "p1.parquet"), str(tmp_path / "p2.parquet")])
    assert len(got) == 6
    assert sorted(got.to_pandas().a) == [1, 1, 2, 2, 3, 3]


def test_to_json_string_form():
    p = pd.DataFrame({"a": [1, 2]})
    m = mpd.from_pandas(p)
    assert m.to_json(orient="records") == p.to_json(orient="records")
    assert m.to_json(orient="split") == p.to_json(orient="split")
