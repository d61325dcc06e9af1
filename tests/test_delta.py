"""Delta segments (index/delta.py): update cost ∝ change (base postings
untouched), read-time layer merge EXACT vs a from-scratch rebuild of the
current corpus, layered tombstones across successive deltas, and
compaction folding segments back into the base."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import functions as F

from vexor_spark.index.delta import (
    SegmentedIndex,
    compact_segments,
    delta_update,
    load_manifest,
)
from vexor_spark.index.merge import update_persisted_index
from vexor_spark.index.storage import PersistedIndex, build_and_write_index
from vexor_spark.sources.corpus import PAGES_SCHEMA

N_PAGES = 50


def _page(i: int, body: str) -> dict:
    return {
        "url": f"https://ex.org/p/{i:04d}.html",
        "warc_ts": dt.datetime(2025, 1, 1) + dt.timedelta(seconds=i),
        "html": body.encode(),
        "text": body,
        "lang": "en",
    }


def _corpus(mutations=None, drop=frozenset(), extra=()):
    mutations = mutations or {}
    recs = []
    for i in range(N_PAGES):
        if i in drop:
            continue
        body = mutations.get(i, f"alpha{i} beta{i} gamma{i} delta{i} common words")
        recs.append(_page(i, body))
    for j, body in extra:
        recs.append(_page(1000 + j, body))
    return recs


def _df(spark, recs):
    return spark.createDataFrame(recs, PAGES_SCHEMA)


def _scores_by_url(searcher, docs_df, query, k=1000):
    ranked = searcher.search_distributed(query, k=k)
    rows = (
        ranked.join(docs_df.select("doc_id", "url"), "doc_id")
        .select("url", "score")
        .collect()
    )
    return {r["url"]: round(float(r["score"]), 6) for r in rows}


def _base_file_state(index_dir: Path) -> dict:
    out = {}
    for sub in ("postings", "dict"):
        for f in sorted((index_dir / sub).rglob("*.parquet")):
            out[str(f)] = (f.stat().st_size, f.stat().st_mtime_ns)
    return out


QUERIES = [
    "common",
    "alpha3 words",
    "freshly minted tokens",
    "alpha7 beta7",
    "brandnew page content",
]


def test_delta_exactness_and_base_untouched(spark, tmp_path):
    work, idx, rebuild = tmp_path / "work", tmp_path / "idx", tmp_path / "rb"
    update_persisted_index(_df(spark, _corpus()), work, idx, term_buckets=8)
    base_state = _base_file_state(idx)

    # delta 1: content change (3), page removed (7), brand-new page
    cur = dict(
        mutations={3: "freshly minted tokens replacing the old body"},
        drop={7},
        extra=[(1, "brandnew page content with common words")],
    )
    s1 = delta_update(_df(spark, _corpus(**cur)), work, idx)
    assert s1["action"] == "delta" and s1["seg"] == 1
    assert s1["docs_tombstoned"] > 0 and s1["docs_written"] > 0
    assert _base_file_state(idx) == base_state, "delta must not touch base postings"

    seg = SegmentedIndex(spark, idx)
    view = seg.docs_view().persist()
    urls = {r["url"] for r in view.select("url").distinct().collect()}
    assert _page(7, "")["url"] not in urls
    assert _page(1001, "")["url"] in urls

    # exact parity vs a from-scratch rebuild of the current corpus
    build_and_write_index(_df(spark, _corpus(**cur)), rebuild, term_buckets=8)
    rb = PersistedIndex(spark, rebuild)
    rb_docs = spark.read.parquet(str(rebuild / "docs"))
    assert seg.doc_count == rb.doc_count
    assert abs(seg.avg_doc_len - rb.avg_doc_len) < 1e-9
    for q in QUERIES:
        got = _scores_by_url(seg, view, q)
        want = _scores_by_url(rb, rb_docs, q)
        assert got == want, q

    # delta 2 re-changes page 3 (layered tombstones: seg-2 tombstone
    # must kill the seg-1 version) and restores page 7
    cur2 = dict(
        mutations={3: "third body entirely different rare tokens"},
        extra=[(1, "brandnew page content with common words")],
    )
    s2 = delta_update(_df(spark, _corpus(**cur2)), work, idx)
    assert s2["action"] == "delta" and s2["seg"] == 2
    assert _base_file_state(idx) == base_state

    seg2 = SegmentedIndex(spark, idx)
    view2 = seg2.docs_view().persist()
    rebuild2 = tmp_path / "rb2"
    build_and_write_index(_df(spark, _corpus(**cur2)), rebuild2, term_buckets=8)
    rb2 = PersistedIndex(spark, rebuild2)
    rb2_docs = spark.read.parquet(str(rebuild2 / "docs"))
    assert seg2.doc_count == rb2.doc_count
    for q in QUERIES + ["third body rare", "alpha7"]:
        got = _scores_by_url(seg2, view2, q)
        want = _scores_by_url(rb2, rb2_docs, q)
        assert got == want, q
    # the seg-1 version's unique terms are gone from the view
    assert _scores_by_url(seg2, view2, "freshly minted") == {}

    # ids are never reused: tombstoned ids stay dead, new ids grow
    man = load_manifest(spark, idx)
    assert man["next_doc_id"] > man["base_max_doc_id"] + 1

    # compaction folds segments into the base; results unchanged
    pre = {q: _scores_by_url(seg2, view2, q) for q in QUERIES}
    compact_segments(spark, work, idx)
    assert not (idx / "segments").exists()
    pi = PersistedIndex(spark, idx)
    pi_docs = spark.read.parquet(str(idx / "docs"))
    for q in QUERIES:
        assert _scores_by_url(pi, pi_docs, q) == pre[q], q
    view.unpersist()
    view2.unpersist()


def test_delta_noop_and_fresh_index(spark, tmp_path):
    work, idx = tmp_path / "w2", tmp_path / "i2"
    update_persisted_index(_df(spark, _corpus()), work, idx, term_buckets=8)
    s = delta_update(_df(spark, _corpus()), work, idx)
    assert s["action"] == "noop"
    # a segmented view with zero segments equals the base exactly
    seg = SegmentedIndex(spark, idx)
    pi = PersistedIndex(spark, idx)
    docs = spark.read.parquet(str(idx / "docs"))
    assert _scores_by_url(seg, docs, "common") == _scores_by_url(pi, docs, "common")


def test_delta_crash_window_resume(spark, tmp_path):
    """ADVICE r4: stage 1 commits lineage before the segment/manifest
    exist. Simulate a crash in that window (stage 1 ran, stage 2
    didn't): the durable pending marker must make the retry finish the
    segment instead of reporting 'noop' on a silently-stale view."""
    from vexor_spark.index.checkpoint import build_chunks_resumable
    from vexor_spark.index.delta import _pending_path

    work, idx = tmp_path / "w3", tmp_path / "i3"
    update_persisted_index(_df(spark, _corpus()), work, idx, term_buckets=8)

    cur = dict(mutations={3: "freshly minted tokens replacing the old body"})
    # "crash": stage 1 runs (lineage committed, chunk store current),
    # stage 2 never does.
    build_chunks_resumable(
        _df(spark, _corpus(**cur)), work, pending_file=_pending_path(idx)
    )
    assert _pending_path(idx).exists()

    # retry with the SAME snapshot: stage 1 sees zero stale buckets,
    # but the pending marker resumes the unfinished segment.
    s = delta_update(_df(spark, _corpus(**cur)), work, idx)
    assert s["action"] == "delta" and s["seg"] == 1
    assert not _pending_path(idx).exists()

    seg = SegmentedIndex(spark, idx)
    view = seg.docs_view()
    rebuild = tmp_path / "rb3"
    build_and_write_index(_df(spark, _corpus(**cur)), rebuild, term_buckets=8)
    rb = PersistedIndex(spark, rebuild)
    rb_docs = spark.read.parquet(str(rebuild / "docs"))
    for q in ("freshly minted", "common"):
        assert _scores_by_url(seg, view, q) == _scores_by_url(rb, rb_docs, q), q

    # leftover marker whose seg already committed (crash after manifest
    # save, before cleanup) is discarded, not re-applied
    import json as _json

    _pending_path(idx).write_text(
        _json.dumps({"changed_buckets": s2_buckets(spark, idx), "seg": 1})
    )
    s2 = delta_update(_df(spark, _corpus(**cur)), work, idx)
    assert s2["action"] == "noop"
    assert not _pending_path(idx).exists()


def s2_buckets(spark, idx):
    man = load_manifest(spark, Path(idx))
    return man["segments"][-1]["changed_buckets"]


def test_segmented_multi_query_rank_identity(spark, tmp_path):
    """SegmentedIndex.search_distributed_multi (round-5): one batched
    job over the layered view, rank-identical to per-query
    search_distributed with 2 live segments."""
    work, idx = tmp_path / "w4", tmp_path / "i4"
    update_persisted_index(_df(spark, _corpus()), work, idx, term_buckets=8)
    cur = dict(mutations={3: "freshly minted tokens replacing the old body"})
    delta_update(_df(spark, _corpus(**cur)), work, idx)
    cur2 = dict(
        mutations={3: "freshly minted tokens replacing the old body",
                   5: "second wave of edits with rare tokens"},
    )
    delta_update(_df(spark, _corpus(**cur2)), work, idx)

    seg = SegmentedIndex(spark, idx)
    assert len(seg.seg_ids) == 2
    queries = {f"q{i}": q for i, q in enumerate(QUERIES + ["zzz nomatch"])}
    batch = seg.search_distributed_multi(queries, k=10).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query"], []).append(
            (r["rank"], r["doc_id"], round(float(r["score"]), 6))
        )
    for name, q in queries.items():
        single = [
            (r["rank"], r["doc_id"], round(float(r["score"]), 6))
            for r in seg.search_distributed(q, k=10).collect()
        ]
        assert sorted(by_q.get(name, [])) == sorted(single), q
