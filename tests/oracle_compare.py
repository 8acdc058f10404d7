"""Shared helper: run a Ray query and its DuckDB oracle SQL, compare.

Approximates the driver's CORRECTNESS check: row count, column names,
and order-insensitive value comparison (columns sorted by name, rows
sorted by all columns).
"""

from __future__ import annotations

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def to_pandas(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(ray_result, sql: str, sf_dir: str, float_tol: float = 1e-9):
    got = canon(to_pandas(ray_result))
    want = canon(duckdb_oracle(sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind in "fc" or w.dtype.kind in "fc":
            diff = (g.astype(float) - w.astype(float)).abs()
            bad = diff > float_tol
            assert not bad.any(), (
                f"{col}: {int(bad.sum())} mismatches, max diff {diff.max()}"
                f"\n{pd.concat([got[bad], want[bad]], axis=1).head()}"
            )
        else:
            same = (g.astype(str).values == w.astype(str).values)
            assert same.all(), (
                f"{col}: {int((~same).sum())} mismatches"
                f"\n{got[~same].head()}\n{want[~same].head()}"
            )
    return len(got)
