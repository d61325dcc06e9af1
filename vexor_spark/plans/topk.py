"""Bounded top-k ranking without a single-partition window.

`row_number() OVER (ORDER BY …)` — even after a `.limit(k)` — compiles
to an unpartitioned WindowExec ("No Partition Defined … moving all data
to a single partition"): a misleading plan at best, a full-corpus
funnel when someone forgets the limit. TakeOrderedAndProject already
performs a distributed partial top-k with a driver-side merge of k
rows, so assigning rank positions there is free, exact, and bounded.

The collect here is the SAME k-row driver materialization TakeOrdered
does internally; callers pass k ≤ a few hundred by contract (search
top-k, rerank candidate clamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def take_ranked(df: DataFrame, order_cols, k: int, *, rank_col: str = "rank") -> DataFrame:
    """orderBy(*order_cols).limit(k) + 1-based `rank_col` prepended.

    Exact equivalent of `row_number() OVER (ORDER BY order_cols)` kept
    to the top k rows, evaluated as TakeOrderedAndProject + a ≤k-row
    driver numbering pass.
    """
    rows = df.orderBy(*order_cols).limit(k).collect()
    schema = StructType(
        [StructField(rank_col, LongType(), False), *df.schema.fields]
    )
    data = [(i + 1, *tuple(r)) for i, r in enumerate(rows)]
    return df.sparkSession.createDataFrame(data, schema)
