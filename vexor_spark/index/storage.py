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


def _topk_np(ids, scores, k: int) -> list[tuple[int, int, float]]:
    """[(rank, doc_id, score)] by (score desc, doc_id asc) — the
    argpartition-then-sort trick (search_service.py:176-182)."""
    import numpy as np

    if len(ids) == 0:
        return []
    if k < len(ids):
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        cand = np.flatnonzero(scores >= kth)  # includes ALL kth-score ties
    else:
        cand = np.arange(len(ids))
    order = sorted(cand.tolist(), key=lambda i: (-scores[i], ids[i]))[:k]
    return [(r + 1, int(ids[i]), float(scores[i])) for r, i in enumerate(order)]


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

    def search_local(
        self, query: str, k: int = 10, *, prune: bool = True
    ) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] — zero-Spark-job serving path.

        prune=True runs exact term-at-a-time max-score pruning with
        block skipping (see _search_local_pruned); prune=False decodes
        every matched list (the reference's own flow,
        vexor/cache.py:1492-1535 → bm25.score_postings) — kept for
        equivalence testing.
        """
        terms = prepare_query_terms(query)
        if not terms or self.doc_count <= 0 or self.avg_doc_len <= 0:
            return []
        tbl = self._arrow_read(
            "postings",
            terms,
            ["term", "df", "block_id", "block_first", "block_last",
             "block_ub", "n", "blob"],
        )
        by_term: dict[str, list] = {}
        dfs: dict[str, int] = {}
        for t, df_, bid, bf, bl, bub, n_, blob in zip(
            tbl.column("term").to_pylist(),
            tbl.column("df").to_pylist(),
            tbl.column("block_id").to_pylist(),
            tbl.column("block_first").to_pylist(),
            tbl.column("block_last").to_pylist(),
            tbl.column("block_ub").to_pylist(),
            tbl.column("n").to_pylist(),
            tbl.column("blob").to_pylist(),
        ):
            by_term.setdefault(t, []).append((bid, bf, bl, bub, int(n_), blob))
            dfs[t] = int(df_)
        for blocks in by_term.values():
            blocks.sort()
        if prune:
            ids, scores = self._search_local_pruned(terms, by_term, dfs, k)
        else:
            ids, scores = self._score_all_np(terms, by_term, dfs)
        return _topk_np(ids, scores, k)

    def _term_contribs(self, term: str, blocks: list, dfs: dict[str, int]):
        """Decode a term's blocks (ONE batch numpy pass over all blobs)
        → (doc_ids, contributions)."""
        import math

        import numpy as np

        from vexor_spark.constants import BM25_B, BM25_K1
        from vexor_spark.functions.codec import decode_blocks_np

        n, avgdl = self.doc_count, self.avg_doc_len
        idf = math.log((n - dfs[term] + 0.5) / (dfs[term] + 0.5) + 1.0)
        ids, tfs, dls = decode_blocks_np([b[5] for b in blocks], [b[4] for b in blocks])
        tfs = tfs.astype(np.float64)
        denom = tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls.astype(np.float64) / avgdl)
        return ids, idf * tfs * (BM25_K1 + 1.0) / denom

    def _score_all_np(self, terms: list[str], by_term: dict, dfs: dict[str, int]):
        """Vectorized decode+score of every matched list (exact
        score_postings semantics, bm25.py:64-89)."""
        import numpy as np

        id_parts, c_parts = [], []
        for t in terms:
            if t not in by_term:
                continue
            ids, cs = self._term_contribs(t, by_term[t], dfs)
            id_parts.append(ids)
            c_parts.append(cs)
        if not id_parts:
            return np.array([], np.int64), np.array([], np.float64)
        all_ids = np.concatenate(id_parts)
        all_cs = np.concatenate(c_parts)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        sums = np.zeros(len(uniq), np.float64)
        np.add.at(sums, inv, all_cs)
        return uniq, sums

    def _search_local_pruned(
        self,
        terms: list[str],
        by_term: dict[str, list],
        dfs: dict[str, int],
        k: int,
    ):
        """Exact TAAT max-score: process terms in descending upper-bound
        order, accumulating full contributions (vectorized); once the
        summed upper bound of unprocessed terms drops strictly below the
        k-th best partial sum, no unseen doc can reach the top-k — the
        accumulator id set freezes, and remaining (head) terms decode
        only blocks whose doc-id range intersects it, keeping only
        frozen ids. Partial sums lower-bound final scores, so the
        threshold is valid; frozen docs still receive every remaining
        contribution ⇒ returned scores are exact, and excluded docs are
        provably outside the top-k.
        """
        import math

        import numpy as np

        n = self.doc_count
        idf = {
            t: math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            for t in terms
            if t in by_term
        }
        ub = {t: idf[t] * max(b[3] for b in by_term[t]) for t in idf}
        order = sorted(idf, key=lambda t: -ub[t])
        remaining = sum(ub.values())

        acc_ids = np.array([], np.int64)
        acc_sums = np.array([], np.float64)
        frozen: np.ndarray | None = None

        for t in order:
            remaining -= ub[t]
            blocks = by_term[t]
            if frozen is not None:
                # keep only blocks whose doc-id range contains a frozen id
                blocks = [
                    b
                    for b in blocks
                    if (lo := np.searchsorted(frozen, b[1])) < len(frozen)
                    and frozen[lo] <= b[2]
                ]
                if not blocks:
                    continue
            ids, cs = self._term_contribs(t, blocks, dfs)
            if frozen is not None:
                pos = np.searchsorted(frozen, ids)
                mask = (pos < len(frozen)) & (frozen[np.minimum(pos, len(frozen) - 1)] == ids)
                ids, cs = ids[mask], cs[mask]
            # merge into accumulators
            merged = np.concatenate([acc_ids, ids])
            merged_c = np.concatenate([acc_sums, cs])
            acc_ids, inv = np.unique(merged, return_inverse=True)
            acc_sums = np.zeros(len(acc_ids), np.float64)
            np.add.at(acc_sums, inv, merged_c)
            if frozen is None and len(acc_ids) >= k:
                theta = np.partition(acc_sums, len(acc_sums) - k)[len(acc_sums) - k]
                if remaining < theta:
                    frozen = acc_ids.copy()
        return acc_ids, acc_sums

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
