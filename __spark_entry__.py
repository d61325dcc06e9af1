"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship BM25 top-10 on sf0.001 documents.
queries()/oracle_sql(): paired Spark/DuckDB definitions from
vexor_spark.catalog — every operator claimed done in SURVEY.md §2 has a
catalog entry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from vexor_spark import catalog, catalog_ext  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.q_bm25_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**catalog.QUERIES, **catalog_ext.EXT_QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**catalog.ORACLE_SQL, **catalog_ext.EXT_ORACLE_SQL}
