"""ANN-served hashed-BoW dense leg (round-5 verdict item 6):
count-sketch projection parity between JVM and driver hashing, IVF
candidate shortlisting + exact-cosine rerank quality through all three
arm orchestrations, and the dense-leg latency path staying
candidate-bounded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vexor_spark.eval import ANN_ARMS, evaluate
from vexor_spark.index.build import build_index
from vexor_spark.operators.fusion import (
    SKETCH_DIM,
    hashed_bow_query_sketch,
)
from vexor_spark.retrieval import ann_dense_candidates
from vexor_spark.sources.corpus import generate_pages_df, query_suite

N_PAGES = 400


@pytest.fixture(scope="module")
def ann_index(spark):
    pages = generate_pages_df(spark, N_PAGES, edges=True, partitions=4)
    idx = build_index(pages, salt_partitions=2, term_buckets=8)
    yield idx
    idx.docs.unpersist()
    idx.postings.unpersist()
    idx.release_caches()


def test_sketch_jvm_driver_parity(ann_index):
    """A query whose text equals a doc's label has the same token
    multiset → same hbow histogram → same count-sketch. JVM lane/sign
    hashes must agree with the pure-Python replication (order of
    float adds differs, hence tolerance, not bit-equality)."""
    row = (
        ann_index.docs.filter(F.col("doc_id") == 20)
        .select("label")
        .collect()[0]
    )
    label = row["label"]
    qsk = hashed_bow_query_sketch(label, ann_index.hbow_idf())
    assert len(qsk) == SKETCH_DIM and any(qsk)
    emb = (
        ann_index.hbow_sketch()
        .filter(F.col("doc_id") == 20)
        .collect()[0]["emb"]
    )
    assert max(abs(a - b) for a, b in zip(qsk, emb)) < 1e-9


def test_ann_candidates_contain_target_and_rank_it_first(ann_index):
    """For a uid query, the ANN shortlist must surface the target doc
    and the exact-cosine rerank must rank it on top (the sketch only
    shortlists; exactness comes from the rerank)."""
    target = (
        ann_index.docs.filter(F.col("doc_id") == 30).collect()[0]
    )
    query = target["label"]
    cand = ann_dense_candidates(ann_index, query).collect()
    assert 0 < len(cand) <= 300  # ≤ n_candidates + lexical_seed
    best = max(cand, key=lambda r: (r["dense_score"], -r["doc_id"]))
    assert best["doc_id"] == 30

    # empty / no-signal query → empty leg, no crash
    assert ann_dense_candidates(ann_index, "搜索引擎").collect() == []


def test_ann_arms_quality(ann_index):
    """The three arm orchestrations over the ANN-served leg.
    Candidate generation is multi-source (IVF sketch probe + lexical
    seed — pure IVF is recall-limited on short keyword queries over
    near-orthogonal tf-idf vectors, measured in EVAL.md), scoring is
    the exact hbow cosine, so quality must track the exact *_hbow
    arms. Floors pin recall from degrading."""
    queries = query_suite(N_PAGES)[:20]
    metrics = evaluate(ann_index, queries, arms=ANN_ARMS)
    for arm in ANN_ARMS:
        assert metrics[arm]["mrr@10"] >= 0.9, (arm, metrics[arm])
    assert metrics["hybrid_ann"]["mrr@10"] >= metrics["off_ann"]["mrr@10"]

def test_ann_pure_ivf_vs_seeded(ann_index):
    """lexical_seed=0 exposes the pure-IVF leg: it must still produce
    a shortlist, and the seeded default must dominate its recall (the
    honest measurement behind the multi-source design)."""
    from vexor_spark.sources.corpus import page_record

    hits_pure = hits_seed = n = 0
    for q in query_suite(N_PAGES)[:12]:
        if not q.get("expected"):
            continue
        n += 1
        for seed, counter in ((0, "pure"), (100, "seeded")):
            cand = ann_dense_candidates(
                ann_index, q["query"], lexical_seed=seed
            )
            urls = {
                r["url"]
                for r in cand.join(
                    ann_index.docs.select("doc_id", "url"), "doc_id"
                ).select("url").collect()
            }
            if q["expected"] in urls:
                if seed == 0:
                    hits_pure += 1
                else:
                    hits_seed += 1
    assert hits_seed >= hits_pure
    assert hits_seed >= round(0.9 * n)


def test_hbow_cell_caches_keyed_by_n_cells(ann_index):
    """Round-5 ADVICE: centroids / cell assignments are cached PER
    n_cells — a second caller with a different cell count must not get
    the first caller's geometry back."""
    c4 = ann_index.hbow_centroids(n_cells=4)
    c8 = ann_index.hbow_centroids(n_cells=8)
    assert len(c4) == 4 and len(c8) == 8
    assert ann_index.hbow_centroids(n_cells=4) is c4  # still cached
    cells4 = ann_index.hbow_sketch_cells(n_cells=4)
    cells8 = ann_index.hbow_sketch_cells(n_cells=8)
    assert cells4 is not cells8
    assert cells4.select(F.max("_cell")).collect()[0][0] <= 3
    assert ann_index.hbow_sketch_cells(n_cells=4) is cells4
