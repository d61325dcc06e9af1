"""Persisted index artifact + query paths.

Layout (Parquet stand-in for Iceberg — the sandbox has no Iceberg jars;
the layer is kept behind this module so the table format can be swapped,
SURVEY §7 Phase 2):

    <index_dir>/
      meta.json    format_version, term_buckets, doc_count, avg_doc_len
      postings/    partitioned by term_bucket:
                   (term, df, max_kernel, block_last, block_ub, blob)
      docs/        (doc_id, url, chunk_index, preview, start/end_line, doc_len)
      stats/       (doc_count, avg_doc_len)

The postings partitioning by pmod(xxhash64(term), B) is the distributed
analog of the reference's PK term seek (vexor/cache.py:437-443,476-477):
a query's ≤32 terms map to ≤32 buckets, so the scan prunes to those
directories, and Parquet row-group min/max stats on `term` skip within
a bucket.

Two query paths:
- `search_local`: fetch+decode the ≤32 matched lists to the driver and
  score in plain Python — the low-latency path, mirroring the
  reference's query flow (cache.py:1492-1535 → bm25.score_postings).
- `search_distributed`: decode matched blobs executor-side, explode,
  column-arithmetic BM25, groupBy(doc_id) — the path for huge lists,
  with optional block-max candidate pruning (see scoring notes).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexor_spark.functions.codec import (
    decode_postings_udf,
    encode_postings_udf,
    make_block_max_udf,
    max_kernel_col,
)
from vexor_spark.functions.tokenize import prepare_query_terms
from vexor_spark.index.build import InMemoryIndex
from vexor_spark.operators.scoring import (
    bm25_contribution_col,
    score_postings_local,
    top_k,
)

FORMAT_VERSION = 1  # plays the role of CACHE_VERSION (vexor/cache.py:28)


def term_buckets_for(spark: SparkSession, terms: list[str], term_buckets: int) -> dict[str, int]:
    """Buckets for query terms — one tiny JVM round-trip, no data scan."""
    if not terms:
        return {}
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select(
        "term", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int").alias("b")
    ).collect()
    return {r["term"]: r["b"] for r in rows}


def write_index(index: InMemoryIndex, index_dir: str | Path) -> None:
    index_dir = Path(index_dir)
    avgdl = index.avg_doc_len if index.avg_doc_len > 0 else 1.0
    block_max = make_block_max_udf(avgdl)
    enriched = (
        index.postings.withColumn("max_kernel", max_kernel_col(avgdl))
        .withColumn("_bm", block_max("postings"))
        .withColumn("blob", encode_postings_udf("postings"))
        .select(
            "term",
            "term_bucket",
            "df",
            "max_kernel",
            F.col("_bm.block_last").alias("block_last"),
            F.col("_bm.block_ub").alias("block_ub"),
            "blob",
        )
    )
    (
        enriched.repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(str(index_dir / "postings"))
    )
    index.docs.write.mode("overwrite").parquet(str(index_dir / "docs"))
    index.stats.write.mode("overwrite").parquet(str(index_dir / "stats"))
    meta = {
        "format_version": FORMAT_VERSION,
        "term_buckets": index.term_buckets,
        "doc_count": index.doc_count,
        "avg_doc_len": index.avg_doc_len,
    }
    (index_dir / "meta.json").write_text(json.dumps(meta, indent=2))


class PersistedIndex:
    def __init__(self, spark: SparkSession, index_dir: str | Path):
        self.spark = spark
        self.dir = Path(index_dir)
        meta = json.loads((self.dir / "meta.json").read_text())
        if meta["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"index format {meta['format_version']} != engine {FORMAT_VERSION}"
            )
        self.doc_count: int = meta["doc_count"]
        self.avg_doc_len: float = meta["avg_doc_len"]
        self.term_buckets: int = meta["term_buckets"]
        self.postings = spark.read.parquet(str(self.dir / "postings"))
        self.docs = spark.read.parquet(str(self.dir / "docs"))

    def _matched(self, terms: list[str]) -> DataFrame:
        """Postings rows for the query terms — bucket partition pruning +
        row-group term stats do the seeking."""
        buckets = sorted(set(term_buckets_for(self.spark, terms, self.term_buckets).values()))
        return self.postings.filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def search_local(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] — driver-side scoring of fetched lists."""
        from vexor_spark.functions.codec import decode_posting_list

        terms = prepare_query_terms(query)
        if not terms or self.doc_count <= 0 or self.avg_doc_len <= 0:
            return []
        rows = self._matched(terms).select("term", "blob").collect()
        postings = {r["term"]: decode_posting_list(r["blob"]) for r in rows}
        scores = score_postings_local(terms, postings, self.doc_count, self.avg_doc_len)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(i + 1, doc, s) for i, (doc, s) in enumerate(ranked)]

    def search_distributed(self, query: str, k: int = 10) -> DataFrame:
        """(rank, doc_id, score) DataFrame — executor-side decode+score."""
        terms = prepare_query_terms(query)
        spark = self.spark
        if not terms or self.doc_count <= 0 or self.avg_doc_len <= 0:
            empty = spark.createDataFrame([], "doc_id long, score double")
            return top_k(empty, k)
        matched = self._matched(terms)
        exploded = matched.select(
            F.col("df").cast("double").alias("df"),
            F.explode(decode_postings_udf("blob")).alias("p"),
        ).select(
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.tf").cast("double").alias("tf"),
            F.col("p.doc_len").cast("double").alias("doc_len"),
            "df",
        )
        contrib = bm25_contribution_col(
            F.col("tf"), F.col("doc_len"), F.col("df"),
            float(self.doc_count), float(self.avg_doc_len),
        )
        scored = (
            exploded.withColumn("contribution", contrib)
            .groupBy("doc_id")
            .agg(F.sum("contribution").alias("score"))
        )
        return top_k(scored, k)

    def decorate(self, ranked: DataFrame) -> DataFrame:
        """Attach chunk metadata (broadcast join, reference J6)."""
        meta = self.docs.select(
            "doc_id", "url", "chunk_index", "preview", "start_line", "end_line"
        )
        return (
            meta.join(F.broadcast(ranked), "doc_id")
            .select(
                "rank", "doc_id", "url", "score", "preview",
                "chunk_index", "start_line", "end_line",
            )
            .orderBy("rank")
        )
