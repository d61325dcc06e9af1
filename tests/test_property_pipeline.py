"""Property-based end-to-end equivalence: hypothesis-generated corpora
(random unicode bodies with CRLF/blank/punctuation/CJK noise) must
produce identical postings, stats, and rank-identical top-k between the
Spark pipeline and the pure-Python oracle."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vexor_spark.index.build import build_index
from vexor_spark.oracle import pyref
from vexor_spark.sources.corpus import PAGES_SCHEMA

_ALPHABET = (
    "abcdefghij XYZ_09 \t\n\r"
    "中文搜索 ,.!?-…  "  # CJK + exotic whitespace/punct
)

bodies = st.lists(
    st.text(alphabet=_ALPHABET, min_size=0, max_size=400),
    min_size=3,
    max_size=10,
)


token_lists = st.lists(
    st.lists(
        st.text(alphabet="abc中_0", min_size=1, max_size=4),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(token_lists)
def test_term_freqs_mapside_equals_shuffle(spark, tokens):
    """The map-side sorted-run-length term_freqs must equal the
    explode+groupBy formulation row-for-row (duplicates, empty docs,
    multi-byte tokens)."""
    from pyspark.sql import functions as F

    from vexor_spark.operators.postings import term_freqs, term_freqs_shuffle

    df = spark.createDataFrame(
        [(i, ts) for i, ts in enumerate(tokens)],
        "doc_id long, tokens array<string>",
    ).withColumn("doc_len", F.size("tokens"))
    got = sorted(map(tuple, term_freqs(df).collect()))
    want = sorted(map(tuple, term_freqs_shuffle(df).collect()))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(bodies, st.integers(min_value=0, max_value=10**6))
def test_random_corpus_engine_equals_oracle(spark, texts, qseed):
    import datetime as dt
    import random

    records = []
    for i, body in enumerate(texts):
        records.append(
            (
                f"https://example.org/p/{i:04d}.html",
                dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i),
                body.encode("utf-8"),
                None,
                "en",
            )
        )
    pages = spark.createDataFrame(records, PAGES_SCHEMA)
    index = build_index(pages, salt_partitions=2, term_buckets=4)
    oracle = pyref.build_corpus_index([(r[0], r[2]) for r in records])

    try:
        assert index.doc_count == oracle["doc_count"]
        assert index.avg_doc_len == pytest.approx(oracle["avg_doc_len"], rel=1e-12)
        got = {
            r["term"]: [(p["doc_id"], p["tf"], p["doc_len"]) for p in r["postings"]]
            for r in index.postings.collect()
        }
        want = {t: sorted(pl) for t, pl in oracle["postings"].items()}
        assert got == want

        # query: random words drawn from the corpus vocabulary (plus noise)
        rng = random.Random(qseed)
        vocab = sorted(want) or ["nomatch"]
        query = " ".join(rng.choices(vocab, k=min(5, len(vocab)))) + " zz_missing"
        want_top = pyref.search(oracle, query, k=5)
        got_top = [
            (r["doc_id"], r["score"]) for r in index.search(query, k=5).collect()
        ]
        assert [d for d, _ in got_top] == [d for d, _ in want_top]
        for (gd, gs), (wd, ws) in zip(got_top, want_top):
            assert gs == pytest.approx(ws, rel=1e-9)
    finally:
        index.docs.unpersist()
        index.postings.unpersist()
