"""Posting-list construction — the shuffle-heavy core (SURVEY A3/A4).

docs(doc_id, document) →
  term_freqs(doc_id, term, tf)        [explode + two-phase hash agg]
  doc_lens(doc_id, doc_len)           [size(tokens), no shuffle]
  stats(doc_count, avg_doc_len)       [global agg, reference
                                       vexor/cache.py:1475-1483]
  postings(term, df, postings:array<struct<doc_id,tf,doc_len>>)
                                      [groupBy(term) + sorted arrays,
                                       reference load shape
                                       vexor/cache.py:1492-1535]

Scale notes:
- tf aggregation is a `groupBy(doc_id, term)` — Spark performs partial
  (map-side) aggregation before the shuffle automatically.
- posting assembly groups by `term`; web-scale term distributions are
  Zipfian, so the head terms are hot reduce keys. `salt_partitions > 1`
  splits each term into `pmod(hash(doc_id), S)` sub-groups, builds
  partial sorted arrays, then merges the S arrays per term — bounding
  any single reduce task's input (SURVEY §4.2; AQE alone cannot split a
  single `collect_list` key).
- doc_len is denormalized into the posting struct, mirroring the
  reference's query-time load shape `(chunk_id, tf, doc_len)`
  (vexor/cache.py:1517-1527) — kills a corpus-sized doclen join at
  query time for the cost of one varint per posting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vexor_spark.constants import DEFAULT_SALT_PARTITIONS, DEFAULT_TERM_BUCKETS
from vexor_spark.functions.tokenize import tokenize_col

POSTING_STRUCT = "struct<doc_id:bigint,tf:int,doc_len:int>"


def tokenize_docs(docs: DataFrame, text_col: str = "document") -> DataFrame:
    """+tokens(array<string>), +doc_len(int). JVM-side regex tokenizer."""
    return docs.withColumn("tokens", tokenize_col(text_col)).withColumn(
        "doc_len", F.size("tokens")
    )


def term_freqs(tokenized: DataFrame) -> DataFrame:
    """(doc_id, doc_len, term, tf) — per-doc term frequencies
    (vexor/bm25.py:60-61 semantics), computed MAP-SIDE.

    All of a document's tokens live in one row, so the per-(doc, term)
    count never needs a shuffle: sort the token array, find run starts,
    and emit (term, run_length) structs — pure JVM expressions. The
    explode+groupBy formulation (kept as `term_freqs_shuffle`) hashes
    and exchanges one row per (doc, term) pair before its final
    aggregation; at index-build scale that exchange is a full extra
    pass of term-string rows over the shuffle bus, back-to-back with
    the term-bucket repartition the block encoder needs anyway.
    Removing it halves the build's shuffled bytes (SURVEY §4.2 scale
    note; the round-5/6 scaling-efficiency weak).

    Every expensive intermediate (the sorted array, the run-start
    positions) is materialized as a REAL projected column before any
    higher-order function references it. Referencing the expression
    itself instead re-evaluates the whole subtree per lambda element —
    element_at(array_sort(tokens), i) inside filter() re-sorts the
    array for every position — measured 126× slower than the shuffle
    formulation at 200k docs (2.5 ms/doc) where this split runs it in
    par with the hash-agg's compute minus its exchange. CollapseProject
    keeps the split projections because the aliases are non-cheap and
    multiply referenced."""
    d = tokenized.select("doc_id", "doc_len", F.array_sort("tokens").alias("s"))
    # 1-based positions where a new run starts in the sorted array.
    # sequence(1, 0) would DESCEND into index 0 for empty docs, so the
    # guard must sit here (starts is a materialized column, evaluated
    # for every row — unlike an expression pruned by a lazy when()).
    # Run-start predicate: position i starts a run iff i == 1 or
    # s[i] != s[i-1]. The comparison index is greatest(i-1, 1) so the
    # i == 1 case never evaluates element_at with index 0 — structurally
    # safe (INVALID_INDEX_OF_ZERO) rather than relying on Or
    # short-circuit evaluation order (round-6 ADVICE): at i == 1 the
    # guarded comparison degenerates to s[1] != s[1] = false and the
    # i == 1 disjunct decides.
    d = d.select(
        "doc_id", "doc_len", "s",
        F.when(
            F.size("s") > 0,
            F.filter(
                F.sequence(F.lit(1), F.size("s")),
                lambda i: (i == F.lit(1))
                | (
                    F.element_at("s", i)
                    != F.element_at("s", F.greatest(i - F.lit(1), F.lit(1)))
                ),
            ),
        ).otherwise(F.array().cast("array<int>")).alias("starts"),
    )
    # Each run ends where the next begins; size(s)+1 closes the last run.
    d = d.select(
        "doc_id", "doc_len", "s", "starts",
        F.concat(
            F.slice("starts", F.lit(2), F.greatest(F.size("starts") - 1, F.lit(0))),
            F.array(F.size("s") + 1),
        ).alias("nexts"),
    )
    runs = F.zip_with(
        "starts",
        "nexts",
        lambda a, b: F.struct(
            F.element_at("s", a).alias("term"), (b - a).cast("int").alias("tf")
        ),
    )
    # sequence(1, 0) would descend — guard the empty-token case (blank
    # docs vanish here exactly as explode of an empty array would).
    runs = F.when(F.size("s") > 0, runs).otherwise(
        F.array().cast("array<struct<term:string,tf:int>>")
    )
    return (
        d.select("doc_id", "doc_len", F.explode(runs).alias("r"))
        .select("doc_id", "doc_len", F.col("r.term").alias("term"), F.col("r.tf").alias("tf"))
    )


def term_freqs_shuffle(tokenized: DataFrame) -> DataFrame:
    """The explode + two-phase hash-agg formulation (one extra full
    exchange of (doc, term) rows). Kept as the property-test oracle for
    `term_freqs` and for A/B shuffle-volume measurement."""
    return (
        tokenized.select("doc_id", "doc_len", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def doc_lens(tokenized: DataFrame) -> DataFrame:
    return tokenized.select("doc_id", "doc_len")


def corpus_stats(doclens: DataFrame) -> DataFrame:
    """(doc_count, avg_doc_len) — vexor/cache.py:1475-1483 semantics."""
    return doclens.agg(
        F.count("*").alias("doc_count"),
        F.avg("doc_len").alias("avg_doc_len"),
    )


def tf_from_doc_table(doc_table: DataFrame) -> DataFrame:
    """Recompute (doc_id, doc_len, term, tf) from the slim persisted doc
    table (url+label → document → JVM tokenize) — lets consumers derive
    tf without re-running the Python chunk stage."""
    from vexor_spark.operators.chunking import with_document

    docs = tokenize_docs(with_document(doc_table), "document")
    return term_freqs(docs.select("doc_id", "doc_len", "tokens"))


def build_postings(
    tf_df: DataFrame,
    *,
    salt_partitions: int = DEFAULT_SALT_PARTITIONS,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """(term, term_bucket, df, postings) with postings sorted by doc_id.

    Two-phase salted assembly: partial sorted arrays per (term, salt),
    then flatten+sort per term. With salt_partitions=1 this degenerates
    to a single groupBy(term).
    """
    posting = F.struct(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("tf").cast("int").alias("tf"),
        F.col("doc_len").cast("int").alias("doc_len"),
    )
    if salt_partitions > 1:
        partial = (
            tf_df.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_partitions)))
            .groupBy("term", "_salt")
            .agg(F.sort_array(F.collect_list(posting)).alias("_part"))
        )
        merged = partial.groupBy("term").agg(
            F.sort_array(F.flatten(F.collect_list("_part"))).alias("postings")
        )
    else:
        merged = tf_df.groupBy("term").agg(
            F.sort_array(F.collect_list(posting)).alias("postings")
        )
    return merged.select(
        "term",
        F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int").alias("term_bucket"),
        F.size("postings").alias("df"),
        "postings",
    )
