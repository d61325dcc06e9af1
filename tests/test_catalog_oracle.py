"""Mimic the driver's correctness gate: every catalog entry's Spark
result must equal its DuckDB oracle SQL exactly (row set, schema names,
values) at sf0.001 and sf0.01."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_MEDIUM, SF_SMALL
from vexor_spark import catalog, catalog_ext

ALL_QUERIES = {**catalog.QUERIES, **catalog_ext.EXT_QUERIES}
ALL_SQL = {**catalog.ORACLE_SQL, **catalog_ext.EXT_ORACLE_SQL}


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetch_df()


def _normalize(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MEDIUM])
def test_catalog_matches_duckdb(spark, name, sf_dir):
    spark_df = ALL_QUERIES[name](spark, sf_dir).toPandas()
    duck_df = _duck(sf_dir, ALL_SQL[name])
    assert sorted(spark_df.columns) == sorted(duck_df.columns), name
    a, b = _normalize(spark_df), _normalize(duck_df)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        if a[col].dtype.kind == "f":
            # nan_ok: nullable numeric columns (e.g. media meta fields)
            # compare null-to-null; the driver's hash gate does the same.
            assert av == pytest.approx(bv, rel=1e-9, abs=1e-9, nan_ok=True), f"{name}.{col}"
        else:
            assert av == bv, f"{name}.{col}"
