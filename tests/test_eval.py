"""Eval harness over the 30-query suite (SURVEY §5 item 4)."""

from __future__ import annotations

from vexor_spark.eval import evaluate
from vexor_spark.index.build import build_index
from vexor_spark.sources.corpus import generate_pages_df, query_suite

N_PAGES = 60


def test_eval_metrics(spark):
    pages = generate_pages_df(spark, N_PAGES, edges=True, partitions=4)
    index = build_index(pages, salt_partitions=2, term_buckets=8)
    queries = query_suite(N_PAGES)[:12]  # subset for test runtime
    metrics = evaluate(index, queries)

    assert set(metrics) == {"off", "bm25", "hybrid"}
    for arm, m in metrics.items():
        assert 0.0 <= m["mrr@10"] <= 1.0
        assert m["hit@1"] <= m["hit@5"] <= 1.0
        assert m["n"] > 0
    # The `bm25` arm reranks DENSE candidates (clamp 20) — with the
    # intentionally weak letter-count dense leg (reference DummyBackend
    # behavior) it cannot recover docs outside the candidate set, so no
    # absolute quality bar applies to it. The hybrid arm fuses the
    # full-corpus BM25 ranking, which must not lose to dense-only.
    assert metrics["hybrid"]["mrr@10"] >= metrics["off"]["mrr@10"] - 0.05

    # Full-corpus BM25 (the primary arm) must nail unique identifiers.
    from vexor_spark.sources.corpus import page_record

    hits = 0
    uid_queries = [q for q in queries if q["query"].startswith("uid_")][:5]
    for q in uid_queries:
        rows = index.search(q["query"], k=1).collect()
        hits += 1 if rows and rows[0]["url"] == q["expected"] else 0
    if uid_queries:
        assert hits == len(uid_queries)
    index.docs.unpersist()
    index.postings.unpersist()


def test_eval_arm_floors(spark):
    """Round-3 quality floors on the committed suite (EVAL.md documents
    the full-scale run): fusing the full-corpus BM25 leg must not lose
    to the dense-candidate rerank arm, and the engine's primary arm
    (bm25_full — full-corpus BM25 over the inverted index) must resolve
    every scored query at rank 1 (each carries its page's unique id)."""
    from vexor_spark.eval import ALL_ARMS, evaluate

    pages = generate_pages_df(spark, N_PAGES, edges=True, partitions=4)
    index = build_index(pages, salt_partitions=2, term_buckets=8)
    queries = query_suite(N_PAGES)[:12]
    metrics = evaluate(index, queries, arms=ALL_ARMS)

    assert metrics["hybrid"]["mrr@10"] >= metrics["bm25"]["mrr@10"]
    assert metrics["bm25_full"]["mrr@10"] == 1.0
    assert metrics["bm25_full"]["hit@1"] == 1.0

    # Strong deterministic dense leg (2^16-bucket hashing-trick BoW): the
    # dense-dependent arms must be non-degenerate and ordered — fusion
    # beats rerank beats dense-only, all strictly above the
    # letter-count backend (round-3 verdict item 2; EVAL.md carries
    # the 500/5k/20k-page campaign numbers).
    assert metrics["off_hbow"]["mrr@10"] > 0.0
    assert metrics["hybrid_hbow"]["mrr@10"] >= metrics["bm25_hbow"]["mrr@10"]
    assert metrics["bm25_hbow"]["mrr@10"] >= metrics["off_hbow"]["mrr@10"]
    assert metrics["off_hbow"]["mrr@10"] > metrics["off"]["mrr@10"]
    index.docs.unpersist()
    index.postings.unpersist()
