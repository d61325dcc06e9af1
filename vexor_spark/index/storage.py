"""Persisted index artifact + query paths (format v2: block-level).

Layout (Parquet stand-in for Iceberg — the sandbox has no Iceberg jars;
the layer is kept behind this module so the table format can be swapped,
SURVEY §7 Phase 2):

    <index_dir>/
      meta.json    format_version, term_buckets, block_size,
                   doc_count, avg_doc_len
      dict/        partitioned by term_bucket:
                   (term, df, max_kernel)           — one row per term
      postings/    partitioned by term_bucket:
                   (term, df, block_id, n, block_first, block_last,
                    block_ub, blob)                 — one row per BLOCK
      docs/        (doc_id, url, chunk_index, preview, lines, doc_len)
      stats/       (doc_count, avg_doc_len)

Posting lists are cut into fixed-size blocks, each independently
delta-gap+varint encoded and carrying its doc-id range and max BM25
contribution kernel. Partitioning by pmod(xxhash64(term), B) is the
distributed analog of the reference's PK term seek
(vexor/cache.py:437-443,476-477): a query's ≤32 terms prune to ≤32
bucket dirs; Parquet row-group min/max stats on `term` skip within a
bucket; block rows let block-max pruning skip work BEFORE decoding.

Query paths:
- `search_local` — zero-Spark-job driver path: Python XXH64 buckets the
  terms, pyarrow reads only those partitions, decode+score in Python
  (the serving path; analog of vexor/cache.py:1492-1535 →
  bm25.score_postings).
- `search_distributed(prune=False)` — decode matched blocks executor-
  side, explode, column-arithmetic BM25, one groupBy(doc_id).
- `search_distributed(prune=True)` — block-max pruning (exact, see
  wand.py): a θ lower bound from the highest-impact term's own top-k,
  candidate generation from only the blocks whose upper bound can reach
  θ, exact rescore restricted to candidates.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexor_spark.functions.codec import (
    POSTING_BLOCK_SIZE,
    decode_postings_udf,
    make_encode_blocks_udf,
    max_kernel_col,
)
from vexor_spark.functions.tokenize import prepare_query_terms
from vexor_spark.index.build import InMemoryIndex
from vexor_spark.operators.scoring import (
    bm25_contribution_col,
    score_postings_local,
    top_k,
)

FORMAT_VERSION = 2  # plays the role of CACHE_VERSION (vexor/cache.py:28)


def term_buckets_for(spark: SparkSession, terms: list[str], term_buckets: int) -> dict[str, int]:
    """Buckets for query terms — pure-Python XXH64 (verified identical to
    Spark's xxhash64, test_hashing.py), no JVM round-trip."""
    from vexor_spark.functions.hashing import spark_pmod_bucket

    return {t: spark_pmod_bucket(t, term_buckets) for t in terms}


def write_index(
    index: InMemoryIndex,
    index_dir: str | Path,
    *,
    block_size: int = POSTING_BLOCK_SIZE,
) -> None:
    index_dir = Path(index_dir)
    avgdl = index.avg_doc_len if index.avg_doc_len > 0 else 1.0
    encode_blocks = make_encode_blocks_udf(avgdl, block_size)
    blocks = (
        index.postings.withColumn("_blocks", encode_blocks("postings"))
        .select(
            "term",
            "term_bucket",
            "df",
            F.explode("_blocks").alias("b"),
        )
        .select("term", "term_bucket", "df", "b.*")
    )
    (
        blocks.repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(str(index_dir / "postings"))
    )
    dictionary = index.postings.select(
        "term", "term_bucket", "df", max_kernel_col(avgdl).alias("max_kernel")
    )
    (
        dictionary.repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(str(index_dir / "dict"))
    )
    index.docs.write.mode("overwrite").parquet(str(index_dir / "docs"))
    index.stats.write.mode("overwrite").parquet(str(index_dir / "stats"))
    meta = {
        "format_version": FORMAT_VERSION,
        "term_buckets": index.term_buckets,
        "block_size": block_size,
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
        self.block_size: int = meta.get("block_size", POSTING_BLOCK_SIZE)
        self.postings = spark.read.parquet(str(self.dir / "postings"))
        self.docs = spark.read.parquet(str(self.dir / "docs"))

    # --- plumbing ---------------------------------------------------------

    def _matched_blocks(self, terms: list[str]) -> DataFrame:
        """Block rows for the query terms — bucket partition pruning +
        row-group term stats do the seeking."""
        buckets = sorted(set(term_buckets_for(self.spark, terms, self.term_buckets).values()))
        return self.postings.filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def _arrow_read(self, subdir: str, terms: list[str], columns: list[str]):
        import pyarrow.dataset as pads

        buckets = sorted(set(term_buckets_for(self.spark, terms, self.term_buckets).values()))
        dataset = pads.dataset(str(self.dir / subdir), format="parquet", partitioning="hive")
        return dataset.to_table(
            columns=columns,
            filter=pads.field("term_bucket").isin(buckets) & pads.field("term").isin(terms),
        )

    def term_dict(self, terms: list[str]) -> dict[str, tuple[int, float]]:
        """{term: (df, max_kernel)} via pyarrow (tiny read, no Spark job)."""
        tbl = self._arrow_read("dict", terms, ["term", "df", "max_kernel"])
        return {
            t: (int(d), float(mk))
            for t, d, mk in zip(
                tbl.column("term").to_pylist(),
                tbl.column("df").to_pylist(),
                tbl.column("max_kernel").to_pylist(),
            )
        }

    # --- query paths --------------------------------------------------------

    def search_local(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] — zero-Spark-job serving path."""
        from vexor_spark.functions.codec import decode_posting_list

        terms = prepare_query_terms(query)
        if not terms or self.doc_count <= 0 or self.avg_doc_len <= 0:
            return []
        tbl = self._arrow_read("postings", terms, ["term", "block_id", "blob"])
        by_term: dict[str, list[tuple[int, bytes]]] = {}
        for t, bid, blob in zip(
            tbl.column("term").to_pylist(),
            tbl.column("block_id").to_pylist(),
            tbl.column("blob").to_pylist(),
        ):
            by_term.setdefault(t, []).append((bid, blob))
        postings = {
            t: [p for _, blob in sorted(blocks) for p in decode_posting_list(blob)]
            for t, blocks in by_term.items()
        }
        scores = score_postings_local(terms, postings, self.doc_count, self.avg_doc_len)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(i + 1, doc, s) for i, (doc, s) in enumerate(ranked)]

    def _score_blocks(self, blocks: DataFrame) -> DataFrame:
        """blocks (term, df, blob, ...) → (doc_id, score)."""
        exploded = blocks.select(
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
        return (
            exploded.withColumn("contribution", contrib)
            .groupBy("doc_id")
            .agg(F.sum("contribution").alias("score"))
        )

    def search_distributed(
        self, query: str, k: int = 10, *, prune: bool = False
    ) -> DataFrame:
        """(rank, doc_id, score) DataFrame — executor-side decode+score;
        with prune=True, block-max pruned (exact — see wand.py)."""
        terms = prepare_query_terms(query)
        spark = self.spark
        if not terms or self.doc_count <= 0 or self.avg_doc_len <= 0:
            empty = spark.createDataFrame([], "doc_id long, score double")
            return top_k(empty, k)
        if prune:
            from vexor_spark.index.wand import pruned_scores

            scored = pruned_scores(self, terms, k)
        else:
            scored = self._score_blocks(self._matched_blocks(terms))
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
