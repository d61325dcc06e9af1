"""Compaction (OPTIMIZE analog, round-3 verdict item 4): after K
fragmenting writes the file count per term_bucket partition is bounded
again, postings content is byte-identical, and queries are unaffected."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from vexor_spark.index.compaction import (
    _partition_inventory,
    compact_index,
)
from vexor_spark.index.storage import PersistedIndex, build_and_write_index
from vexor_spark.sources.corpus import generate_pages_df

K_FRAGMENTS = 5


def _fragment_subdir(spark, subdir, k=K_FRAGMENTS):
    """Re-write a partitioned subdir as k append slices — the file
    state an append-per-batch ingest (or k merges without partition
    overwrite) leaves behind. Content-preserving by construction:
    slices partition the rows by a term hash."""
    rows = spark.read.option("basePath", str(subdir)).parquet(str(subdir))
    staging = subdir.parent / (subdir.name + "_frag")
    for i in range(k):
        (
            rows.filter(F.pmod(F.xxhash64("term"), F.lit(k)) == i)
            .coalesce(1)
            .write.mode("append")
            .partitionBy("term_bucket")
            .parquet(str(staging))
        )
    shutil.rmtree(subdir)
    staging.rename(subdir)


def _sorted_rows(spark, subdir):
    df = spark.read.option("basePath", str(subdir)).parquet(str(subdir))
    cols = sorted(df.columns)
    return sorted(
        tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v for v in r)
        for r in df.select(*cols).collect()
    )


def test_compaction_bounds_files_and_preserves_postings(spark, tmp_path):
    pages = generate_pages_df(spark, 120, edges=True, partitions=4)
    idx_dir = tmp_path / "idx"
    build_and_write_index(pages, idx_dir, term_buckets=8)

    query = "spark merge window"
    before_search = [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in PersistedIndex(spark, idx_dir).search_distributed(query, k=10).collect()
    ]
    before_postings = _sorted_rows(spark, idx_dir / "postings")
    before_dict = _sorted_rows(spark, idx_dir / "dict")

    for sub in ("postings", "dict"):
        _fragment_subdir(spark, idx_dir / sub)
    frag_inv = _partition_inventory(idx_dir / "postings")
    assert all(n >= 2 for n, _sz in frag_inv.values()), frag_inv
    # fragmentation is content-preserving (precondition of the test)
    assert _sorted_rows(spark, idx_dir / "postings") == before_postings

    rec = compact_index(spark, idx_dir, target_file_bytes=1 << 30)
    assert rec["postings"]["fragmented"] == len(frag_inv)
    # bound: huge target -> exactly one file per partition
    for sub in ("postings", "dict"):
        inv = _partition_inventory(idx_dir / sub)
        assert all(n == 1 for n, _sz in inv.values()), (sub, inv)
    assert rec["postings"]["files_after"] == len(frag_inv)

    # postings + dict content identical to the pre-fragmentation index
    assert _sorted_rows(spark, idx_dir / "postings") == before_postings
    assert _sorted_rows(spark, idx_dir / "dict") == before_dict

    # queries identical through the persisted serving path
    after_search = [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in PersistedIndex(spark, idx_dir).search_distributed(query, k=10).collect()
    ]
    assert after_search == before_search

    # metrics appended + idempotence: a second run finds nothing
    assert (idx_dir / "metrics.jsonl").exists()
    rec2 = compact_index(spark, idx_dir, target_file_bytes=1 << 30)
    assert rec2["postings"]["fragmented"] == 0
    assert rec2["postings"]["files_after"] == rec["postings"]["files_after"]


def test_compaction_respects_target_size(spark, tmp_path):
    """A small target keeps multiple right-sized files per partition —
    compaction must not collapse beyond ⌈bytes/target⌉."""
    pages = generate_pages_df(spark, 120, edges=True, partitions=4)
    idx_dir = tmp_path / "idx2"
    build_and_write_index(pages, idx_dir, term_buckets=4)
    _fragment_subdir(spark, idx_dir / "postings", k=7)

    inv = _partition_inventory(idx_dir / "postings")
    target = 16 << 10  # 16 KiB -> several files per partition here
    import math

    compact_index(spark, idx_dir, target_file_bytes=target)
    after = _partition_inventory(idx_dir / "postings")
    for b, (_n, sz) in inv.items():
        want = max(1, math.ceil(sz / target))
        n_after, _ = after[b]
        # file sizes shift slightly on rewrite; bound by the plan's
        # wanted count (exact, since groups are hash-assigned up front)
        assert n_after <= want, (b, n_after, want)
