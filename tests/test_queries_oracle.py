"""Every oracle-checkable query must match DuckDB exactly at sf0.001.

This mirrors the driver's correctness harness: run the Ray query and
the oracle SQL on the same parquet tables, normalize (sort columns by
name, sort rows), compare exactly.
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _registry():
    from naer_ray.pipelines.queries import REGISTRY

    return [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql is not None]


@pytest.mark.parametrize("name", [n for n, _, _ in _registry()])
def test_query_matches_oracle(name, ray_session, con):
    from naer_ray.pipelines.queries import REGISTRY

    fn, sql = REGISTRY[name]
    res = fn(SF)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    oracle = con.sql(sql).df()
    a, b = _norm(res), _norm(oracle)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    assert sorted(a.columns) == sorted(b.columns), f"{name}: {a.columns} vs {b.columns}"
    # Driver's value hash is dtype-sensitive (int64 1 != float64 1.0): the
    # dtype KIND must agree or the driver flags hash_match=false even when
    # values are identical (round-1 q10/q19/q23 HUGEINT artifact).
    kinds_a = {c: a[c].dtype.kind for c in a.columns}
    kinds_b = {c: b[c].dtype.kind for c in b.columns}
    assert kinds_a == kinds_b, f"{name}: dtype kinds {kinds_a} vs {kinds_b}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
