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
    count never needs a shuffle. The explode+groupBy formulation (kept
    as `term_freqs_shuffle`) hashes and exchanges one row per
    (doc, term) pair before its final aggregation; at index-build
    scale that exchange is a full extra pass of term-string rows over
    the shuffle bus, back-to-back with the term-bucket repartition the
    block encoder needs anyway. Removing it halves the build's
    shuffled bytes (SURVEY §4.2 scale note).

    Round-7 formulation: a mapInPandas kernel — the batch's tokens
    flatten into one fixed-width numpy unicode array, one lexsort by
    (doc, token) clusters equal tokens, and run lengths fall out of
    the boundary diff: ~4 vectorized C passes per Arrow batch. The
    round-6 shape (kept as `term_freqs_hof`) did the same run-length
    with Column higher-order functions (array_sort+filter+zip_with),
    which are CodegenFallback — an interpreted expression eval per
    token, the ~10% single-box CPU tax BASELINE.md round-6 addendum
    (b) flagged as future work. Only the sort's CLUSTERING matters
    (any consistent order groups equal tokens), so numpy codepoint
    order vs Java UTF-16 order is immaterial; the property pin
    `term_freqs ≡ term_freqs_shuffle` (tests/test_property_pipeline)
    gates the formulation on hypothesis corpora (CJK, punctuation,
    duplicates, empty docs). Blank docs emit no rows, exactly as
    explode of an empty array would."""
    import numpy as np
    import pandas as pd

    schema = "doc_id long, doc_len int, term string, tf int"

    def run_lengths(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            counts = np.fromiter(map(len, pdf["tokens"]), np.int64, len(pdf))
            total = int(counts.sum())
            if total == 0:
                continue
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in pdf["tokens"]]
            )
            arr = flat.astype("U")
            doc_pos = np.repeat(np.arange(len(pdf), dtype=np.int64), counts)
            order = np.lexsort((arr, doc_pos))
            sa, sd = arr[order], doc_pos[order]
            new = np.empty(total, bool)
            new[0] = True
            new[1:] = (sd[1:] != sd[:-1]) | (sa[1:] != sa[:-1])
            starts = np.flatnonzero(new)
            tf = np.diff(np.append(starts, total)).astype(np.int32)
            run_doc = sd[starts]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[run_doc],
                    "doc_len": pdf["doc_len"].to_numpy()[run_doc],
                    "term": sa[starts],
                    "tf": tf,
                }
            )

    return tokenized.select("doc_id", "doc_len", "tokens").mapInPandas(
        run_lengths, schema
    )


def term_freqs_hof(tokenized: DataFrame) -> DataFrame:
    """The round-6 zero-exchange formulation in Column higher-order
    functions — kept for A/B measurement and as a second equivalence
    oracle. Every expensive intermediate (the sorted array, the
    run-start positions) is materialized as a REAL projected column
    before any HOF references it: referencing the expression itself
    re-evaluates the whole subtree per lambda element (measured 126×
    slower). The run-start comparison index is greatest(i-1, 1) so
    the i == 1 case never evaluates element_at with index 0 —
    structurally safe (round-6 ADVICE) rather than relying on Or
    short-circuit order: at i == 1 the guarded comparison degenerates
    to s[1] != s[1] = false and the i == 1 disjunct decides."""
    d = tokenized.select("doc_id", "doc_len", F.array_sort("tokens").alias("s"))
    # 1-based positions where a new run starts in the sorted array.
    # sequence(1, 0) would DESCEND into index 0 for empty docs, so the
    # guard must sit here (starts is a materialized column, evaluated
    # for every row — unlike an expression pruned by a lazy when()).
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


# tf implementation for the INDEX-BUILD pipeline (rebind for A/B:
# scripts/bench_build.py VEXOR_TF_IMPL). Measured round-7 (100k pages,
# interleaved A/B, 3 pairs): the mapInPandas kernel is consistently
# +10-20% on the build's tf+encode stage — the build already crosses
# to Python for the streaming block ENCODER, so the kernel adds a
# second full Arrow crossing of the token rows, which costs more than
# the interpreted-HOF tax it removes. Standalone tf queries (term_tf /
# term_df) end at the tf rows, cross the boundary exactly once either
# way, and measure −31%/−27% with the kernel — so `term_freqs` (the
# query default) is the kernel and the build binds the HOF form. Both
# zero-exchange plans; both property-pinned against term_freqs_shuffle.
term_freqs_build = term_freqs_hof


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
    tf without re-running the Python chunk stage. Build-pipeline
    consumer: binds `term_freqs_build` (module attribute, see above)
    at CALL time so the bench A/B rebind works."""
    from vexor_spark.operators.chunking import with_document

    docs = tokenize_docs(with_document(doc_table), "document")
    return term_freqs_build(docs.select("doc_id", "doc_len", "tokens"))


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
