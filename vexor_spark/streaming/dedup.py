"""Streaming exact deduplication for continuous document ingestion —
the streaming counterpart of the batch keep-one policy
(operators/dedup.exact_dup_groups).

`dedup_stream` fingerprints each arriving document (the same
cross-engine rolling hash as the batch path) and keeps the FIRST
arrival per fingerprint via `dropDuplicatesWithinWatermark`: Spark
keeps one state entry per fingerprint and expires it once the
event-time watermark passes, so state is bounded by the dedup horizon
instead of growing with the corpus — the property that keeps this
runnable forever on a 100 TB/day crawl. Semantics vs batch: batch
keep-one elects min doc_id per fingerprint; streaming keep-one elects
the first ARRIVAL (and re-admits a fingerprint after the horizon
passes) — both are documented reference points, and the batch entry
remains the oracle-checked ground truth for a bounded corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vexor_spark.functions.fasthash import poly_hash_text_udf


def dedup_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-seen exact dedup on a streaming document frame
    (… ts timestamp, text string …) → the surviving rows plus their
    `fingerprint`. State per distinct fingerprint, expired at
    `watermark` past the max seen event time."""
    return (
        # vectorized Arrow fingerprint kernel (same value as
        # poly_hash_col; pandas UDFs are supported on streaming frames)
        docs.withColumn("fingerprint", poly_hash_text_udf(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
