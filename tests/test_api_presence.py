"""Mechanical API-presence probe vs the reference inventory.

Parses the reference's public surface (modin/pandas/base.py dataframe.py
series.py class bodies — names only, no code) and asserts every public
attribute exists on our DataFrame/Series, excluding the declared
out-of-scope backend attributes. This keeps COVERAGE.md's presence claim
auditable instead of hand-counted.
"""

import ast

import pandas as pd
import pytest

REF = "/root/reference/modin/pandas"

# backend/engine-specific surface we intentionally do not carry:
#   modin   - backend-switching accessor (`df.modin.to_pandas()` etc.)
#   move_to - partition relocation between modin engines
#   sparse  - SparseAccessor over pandas sparse dtypes
OUT_OF_SCOPE = {"modin", "move_to", "sparse"}


def _class_attr_names(path: str, classname: str) -> set[str]:
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == classname:
            names = set()
            for n in node.body:
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    names.add(n.name)
                elif isinstance(n, ast.Assign):
                    names.update(t.id for t in n.targets if isinstance(t, ast.Name))
                elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
                    names.add(n.target.id)
            return names
    raise AssertionError(f"{classname} not found in {path}")


@pytest.fixture(scope="module")
def inventories():
    base = _class_attr_names(f"{REF}/base.py", "BasePandasDataset")
    df = _class_attr_names(f"{REF}/dataframe.py", "DataFrame")
    ser = _class_attr_names(f"{REF}/series.py", "Series")
    pub = lambda s: {n for n in s if not n.startswith("_")} - OUT_OF_SCOPE
    return pub(base | df), pub(base | ser)


def test_dataframe_presence(spark, inventories):
    import modin_spark.pandas as mpd

    df_names, _ = inventories
    mdf = mpd.from_pandas(pd.DataFrame({"a": [1], "s": ["x"]}))
    missing = sorted(n for n in df_names if not hasattr(mdf, n))
    assert not missing, f"DataFrame missing {len(missing)}: {missing}"


def test_series_presence(spark, inventories):
    import modin_spark.pandas as mpd

    _, ser_names = inventories
    s = mpd.from_pandas(pd.DataFrame({"a": [1]})).a
    missing = sorted(n for n in ser_names if not hasattr(s, n))
    assert not missing, f"Series missing {len(missing)}: {missing}"


def test_module_namespace_presence():
    """Every name in the reference's modin.pandas.__all__ exists on
    modin_spark.pandas (pandas scalars/dtypes/options re-exported; engine
    functions implemented or delegated)."""
    import re

    import modin_spark.pandas as mpd

    src = open(f"{REF}/__init__.py").read()
    seg = src[src.find("__all__"):]
    names = re.findall(r'"([A-Za-z_][A-Za-z0-9_]*)"', seg[:seg.find("]")])
    missing = [n for n in names if not hasattr(mpd, n)]
    assert not missing, missing
