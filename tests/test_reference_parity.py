"""Direct parity against the REFERENCE'S OWN code: when the reference
checkout is present (read-only at /root/reference), import its
`vexor.bm25` module and assert our oracle, our Spark scorer, and the
end-to-end engine agree with it — the strongest possible rank-identity
evidence (no re-derivation in the loop). Skipped if the reference is
absent so the repo stays standalone.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
if not (REFERENCE / "vexor" / "bm25.py").exists():  # pragma: no cover
    pytest.skip("reference checkout not present", allow_module_level=True)
sys.path.insert(0, str(REFERENCE))

import vexor.bm25 as ref_bm25  # noqa: E402  (the reference itself)

from vexor_spark.oracle import pyref  # noqa: E402

TEXTS = [
    "Hello World",
    "snake_case_identifier CamelCaseToken mixed_Case_99",
    "!!! ??? ;;;",
    "",
    "中文 mixed ascii_term 混合",
    "digits 123 456_789",
    "CRLF\r\nlines\nhere tab\tsep",
    "Ünïcode Straße",
]


def test_tokenizer_matches_reference():
    # `tokenizers` is absent in this environment, so the reference runs
    # its regex fallback — the path this engine pins.
    assert ref_bm25._get_bm25_tokenizer() is None
    for t in TEXTS:
        assert pyref.tokenize(t) == ref_bm25.tokenize(t), t


def test_score_postings_matches_reference():
    rng = random.Random(99)
    doc_lens = {d: rng.randint(1, 60) for d in range(150)}
    postings = {}
    for i in range(40):
        docs = rng.sample(range(150), rng.randint(1, 50))
        postings[f"t{i}"] = [(d, rng.randint(1, 6), doc_lens[d]) for d in sorted(docs)]
    avgdl = sum(doc_lens.values()) / len(doc_lens)
    for _ in range(10):
        q = [f"t{rng.randint(0, 50)}" for _ in range(rng.randint(1, 8))]
        ours = pyref.score_postings(q, postings, 150, avgdl)
        theirs = ref_bm25.score_postings(q, postings, 150, avgdl)
        assert ours.keys() == theirs.keys()
        for d in theirs:
            assert ours[d] == pytest.approx(theirs[d], rel=1e-12)
    # guards
    assert ref_bm25.score_postings(["x"], postings, 0, avgdl) == pyref.score_postings(
        ["x"], postings, 0, avgdl
    )


def test_rrf_fuse_matches_reference():
    rng = random.Random(7)
    total = 40
    dense_order = list(range(total))
    rng.shuffle(dense_order)
    bm25 = {d: rng.uniform(-1, 5) for d in rng.sample(range(total), 25)}
    theirs = ref_bm25.rrf_fuse(dense_order, bm25, total)  # float32 array
    ours = pyref.rrf_fuse(dense_order, bm25)
    for row in range(total):
        assert ours.get(row, 0.0) == pytest.approx(float(theirs[row]), rel=1e-6)
    # rank order identical under (score desc, row asc)
    t_rank = sorted(range(total), key=lambda r: (-theirs[r], r))
    o_rank = sorted(range(total), key=lambda r: (-ours.get(r, 0.0), r))
    assert t_rank == o_rank


def test_engine_topk_matches_reference_scoring(spark):
    """End-to-end: the Spark engine's top-k equals ranking computed with
    the REFERENCE's tokenize/build_document/term_frequencies/
    score_postings over the same chunk payloads."""
    from vexor_spark.index.build import build_index
    from vexor_spark.operators.chunking import chunk_page_py
    from vexor_spark.sources.corpus import generate_pages_df, generate_pages_local, query_suite

    n = 50
    pages = generate_pages_df(spark, n, edges=True, partitions=3)
    index = build_index(pages, salt_partitions=2, term_buckets=8)

    # reference-built lexical index over identical payloads
    postings: dict = {}
    doc_lens = []
    doc_id = 0
    for rec in sorted(generate_pages_local(n, edges=True), key=lambda r: r["url"]):
        for payload in chunk_page_py(rec["url"], rec["html"]):
            document = ref_bm25.build_document(rec["url"], payload["label"])
            tokens = ref_bm25.tokenize(document)
            tfs = ref_bm25.term_frequencies(tokens)
            for term, tf in tfs.items():
                postings.setdefault(term, []).append((doc_id, tf, len(tokens)))
            doc_lens.append(len(tokens))
            doc_id += 1
    doc_count = len(doc_lens)
    avgdl = sum(doc_lens) / doc_count

    for q in [query_suite(n)[i]["query"] for i in (0, 4, 11, 20, 27)]:
        terms = list(dict.fromkeys(ref_bm25.tokenize(q)))[: ref_bm25.MAX_QUERY_TERMS]
        ref_scores = ref_bm25.score_postings(terms, postings, doc_count, avgdl)
        # engine default ranks on 6dp-rounded scores (round-7 public
        # contract) — rank the reference scores the same way.
        rounded = {d: round(s, 6) for d, s in ref_scores.items()}
        want = sorted(rounded.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = [
            (r["doc_id"], r["score"])
            for r in index.search(q, k=10).select("doc_id", "score").collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)
    index.docs.unpersist()
    index.postings.unpersist()
