"""Retrieval-quality evaluation — the reference's eval harness
(scripts/eval_hybrid.py:59-76, 108-139) over the synthetic query suite:
arms `off` (dense only), `bm25` (legacy weighted rerank), `hybrid`
(RRF fusion); metrics MRR@10, Hit@1, Hit@5.

Rank of the expected url = position of its FIRST chunk in the result
list (the reference resolves results to relative paths and takes the
first match, eval_hybrid.py:49-76).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vexor_spark.index.build import InMemoryIndex
from vexor_spark.retrieval import dense_scores, hybrid_search, weighted_rerank_search

ARMS = ("off", "bm25", "hybrid")
# The reference's three arms all lean on the dense leg (DummyBackend
# letter counts in its tests; an embedding service in production).
# `bm25_full` is this engine's primary path — full-corpus BM25 over
# the inverted index — included so the eval shows what the index
# itself delivers when the dense leg degrades with corpus size.
# The `*_hbow` arms rerun the same three orchestrations with the
# strong deterministic dense leg (HASHED_BOW_DIM = 2^16-bucket
# hashing-trick tf-idf bag-of-words, fusion.hashed_bow_scores) instead
# of the letter-count test backend — no model or network, but actually
# discriminative at corpus scale.
HBOW_ARMS = ("off_hbow", "bm25_hbow", "hybrid_hbow")
# `*_ann` arms: the same three orchestrations with the dense leg
# SERVED THROUGH ANN (retrieval.ann_dense_candidates — IVF over the
# count-sketch projection, exact hbow cosine on the shortlist) instead
# of a full per-query histogram scan. Same quality target as the
# *_hbow arms with sublinear dense-leg latency (round-5 item 6).
ANN_ARMS = ("off_ann", "bm25_ann", "hybrid_ann")
ALL_ARMS = ARMS + ("bm25_full",) + HBOW_ARMS + ANN_ARMS


def _ranked_urls(index: InMemoryIndex, arm: str, query: str, top: int) -> list[str]:
    from vexor_spark.plans.topk import take_ranked

    if arm == "bm25_full":
        rows = index.search(query, k=top).orderBy("rank").select("url").collect()
        return [r["url"] for r in rows]
    if arm.endswith("_ann"):
        from vexor_spark.retrieval import ann_dense_candidates

        dense = ann_dense_candidates(index, query)
        base = arm.removesuffix("_ann")
        if base == "off":
            ranked = take_ranked(dense, [F.desc("dense_score"), F.asc("doc_id")], top)
        elif base == "bm25":
            ranked = weighted_rerank_search(index, query, top, dense_override=dense)
        elif base == "hybrid":
            ranked = hybrid_search(index, query, top, dense_override=dense)
        else:
            raise ValueError(arm)
        rows = (
            ranked.join(index.docs.select("doc_id", "url"), "doc_id")
            .orderBy("rank")
            .select("url")
            .collect()
        )
        return [r["url"] for r in rows]
    backend = "hashed_bow" if arm.endswith("_hbow") else "letter"
    base = arm.removesuffix("_hbow")
    if base == "off":
        ranked = take_ranked(
            dense_scores(
                index.docs,
                query,
                backend,
                hbow_counts=index.hbow_counts() if backend == "hashed_bow" else None,
                hbow_idf=index.hbow_idf() if backend == "hashed_bow" else None,
            ),
            [F.desc("dense_score"), F.asc("doc_id")],
            top,
        )
    elif base == "bm25":
        ranked = weighted_rerank_search(index, query, top, dense_backend=backend)
    elif base == "hybrid":
        ranked = hybrid_search(index, query, top, dense_backend=backend)
    else:
        raise ValueError(arm)
    rows = (
        ranked.join(index.docs.select("doc_id", "url"), "doc_id")
        .orderBy("rank")
        .select("url")
        .collect()
    )
    return [r["url"] for r in rows]


def evaluate(
    index: InMemoryIndex,
    queries: list[dict],
    *,
    arms: tuple[str, ...] = ARMS,
    top: int = 10,
) -> dict:
    """{arm: {mrr@10, hit@1, hit@5, n}} over (query, expected-url) pairs;
    queries with expected=None are skipped (they test edge behavior,
    not ranking quality)."""
    scored = [q for q in queries if q.get("expected")]
    out: dict = {}
    for arm in arms:
        rr_sum = hit1 = hit5 = 0
        for q in scored:
            urls = _ranked_urls(index, arm, q["query"], top)
            try:
                rank = urls.index(q["expected"]) + 1
            except ValueError:
                rank = None
            if rank is not None:
                rr_sum += 1.0 / rank
                hit1 += 1 if rank == 1 else 0
                hit5 += 1 if rank <= 5 else 0
        n = len(scored)
        out[arm] = {
            "mrr@10": round(rr_sum / n, 4) if n else 0.0,
            "hit@1": round(hit1 / n, 4) if n else 0.0,
            "hit@5": round(hit5 / n, 4) if n else 0.0,
            "n": n,
        }
    return out
