"""Unified update_index (index/maintenance.py): shape-measured routing
— concentrated→in-place, diffuse→delta, huge→full rebuild, ordering
shift→delta — each route's result exact vs a from-scratch rebuild, and
budget-triggered auto-compaction folding segments back into the base.

Replaces the reference's single change-ratio gate
(vexor/services/index_service.py:29, :263-344) with routing driven by
the 2M-page measurements in BENCH_R04_SCALE.json (in-place = 1.32× a
full rebuild under diffuse change; delta = 0.13×)."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from vexor_spark.index.delta import SegmentedIndex, load_manifest
from vexor_spark.index.maintenance import (
    compaction_due,
    measure_change_shape,
    update_index,
)
from vexor_spark.index.storage import PersistedIndex, build_and_write_index
from vexor_spark.sources.corpus import PAGES_SCHEMA

N_PAGES = 48
TERM_BUCKETS = 64


def _page(i: int, body: str) -> dict:
    # urls share their token set except the numeric id — so a page's
    # term footprint is its BODY vocabulary plus {https, ex, org, p,
    # <id>, html}: a tiny-vocab body edit stays concentrated.
    return {
        "url": f"https://ex.org/p/{i:04d}.html",
        "warc_ts": dt.datetime(2025, 1, 1) + dt.timedelta(seconds=i),
        "html": body.encode(),
        "text": body,
        "lang": "en",
    }


def _diverse_body(i: int) -> str:
    return f"alpha{i} beta{i} gamma{i} delta{i} common words"


def _corpus(mutations=None, drop=frozenset(), bodies=_diverse_body):
    mutations = mutations or {}
    return [
        _page(i, mutations.get(i, bodies(i)))
        for i in range(N_PAGES)
        if i not in drop
    ]


def _df(spark, recs):
    return spark.createDataFrame(recs, PAGES_SCHEMA)


def _scores(spark, searcher, docs_df, query, k=1000):
    ranked = searcher.search_distributed(query, k=k)
    rows = (
        ranked.join(docs_df.select("doc_id", "url"), "doc_id")
        .select("url", "score")
        .collect()
    )
    return {r["url"]: round(float(r["score"]), 6) for r in rows}


def _assert_view_exact(spark, tmp_path, idx, recs, queries, tag):
    seg = SegmentedIndex(spark, idx)
    view = seg.docs_view()
    rb_dir = tmp_path / f"rb_{tag}"
    build_and_write_index(_df(spark, recs), rb_dir, term_buckets=TERM_BUCKETS)
    rb = PersistedIndex(spark, rb_dir)
    rb_docs = spark.read.parquet(str(rb_dir / "docs"))
    assert seg.doc_count == rb.doc_count
    for q in queries:
        assert _scores(spark, seg, view, q) == _scores(spark, rb, rb_docs, q), (
            tag, q,
        )


def test_update_index_routes_by_shape(spark, tmp_path):
    work, idx = tmp_path / "w", tmp_path / "i"
    # shared-vocab corpus: a one-page edit's affected-term footprint is
    # the bucket's url ids + the shared body + the edit — genuinely
    # concentrated. (With per-page unique vocabularies even a one-page
    # edit is diffuse, because the edit's input BUCKET drags its
    # co-resident docs' vocabularies into the rewrite — the router
    # measures that honestly; see the diffuse step below.)
    bodies = lambda i: "shared tiny vocab body common words"  # noqa: E731

    # 0) no index → full build
    s0 = update_index(
        _df(spark, _corpus(bodies=bodies)), work, idx, term_buckets=TERM_BUCKETS
    )
    assert s0["route"] == "full_build"

    # noop
    s_no = update_index(_df(spark, _corpus(bodies=bodies)), work, idx)
    assert s_no["route"] == "noop" and s_no["compaction"] is None

    # 1) CONCENTRATED: one page's body edit inside the shared tiny
    # vocabulary — old ∪ new terms span ≪ 25% of 64 buckets → in-place.
    cur = {3: "shared tiny vocab body common tricky"}
    s1 = update_index(_df(spark, _corpus(mutations=cur, bodies=bodies)), work, idx)
    assert s1["route"] == "inplace", s1
    assert s1["shape"]["bucket_ratio"] <= 0.25
    _assert_view_exact(
        spark, tmp_path, idx, _corpus(mutations=cur, bodies=bodies),
        ["common", "tricky", "shared vocab"], "inplace",
    )

    # 2) DIFFUSE: many pages change and their unique per-page
    # vocabularies spray across most term buckets → delta segment.
    cur2 = dict(cur)
    for i in range(0, N_PAGES, 4):  # ~⅓ of input buckets: below the 0.5
        cur2[i] = f"edited{i} fresh{i} body{i} new{i} common words"
    # tombstone_ratio=1.0 keeps the segment alive for inspection —
    # with the default 0.2 budget this very update would (correctly)
    # auto-compact, which test_auto_compaction_budget covers.
    s2 = update_index(
        _df(spark, _corpus(mutations=cur2, bodies=bodies)), work, idx,
        tombstone_ratio=1.0,
    )
    assert s2["route"] == "delta", s2
    assert s2["route_reason"].startswith("diffuse")
    assert s2["shape"]["bucket_ratio"] > 0.25
    man = load_manifest(spark, idx)
    assert len(man["segments"]) == 1
    _assert_view_exact(
        spark, tmp_path, idx, _corpus(mutations=cur2, bodies=bodies),
        ["common", "edited4 fresh4", "tricky"], "delta",
    )

    # 2b) live segments force delta even for a concentrated edit
    cur3 = dict(cur2)
    cur3[3] = "shared tiny vocab body common quirky"
    s3 = update_index(
        _df(spark, _corpus(mutations=cur3, bodies=bodies)), work, idx,
        tombstone_ratio=1.0,
    )
    assert s3["route"] == "delta" and s3["route_reason"] == "live_segments"

    # 3) HUGE: >50% of input buckets change → full rebuild, segments
    # cleared.
    cur4 = {i: f"rewrite{i} everything{i} common words" for i in range(N_PAGES)}
    s4 = update_index(_df(spark, _corpus(mutations=cur4, bodies=bodies)), work, idx)
    assert s4["route"] == "full_rebuild", s4
    assert not (idx / "segments").exists()
    assert not load_manifest(spark, idx)["segments"]
    _assert_view_exact(
        spark, tmp_path, idx, _corpus(mutations=cur4, bodies=bodies),
        ["common", "rewrite7 everything7", "quirky"], "rebuild",
    )


def test_update_index_ordering_shift_routes_to_delta(spark, tmp_path):
    """A new url sorting BEFORE survivors shifts every dense doc id —
    in-place must refuse; the router lands on delta (which keeps
    surviving ids and allocates fresh ones) instead of paying a full
    rebuild."""
    work, idx = tmp_path / "w2", tmp_path / "i2"
    bodies = lambda i: "shared tiny vocab body"  # noqa: E731 — concentrated shape
    update_index(_df(spark, _corpus(bodies=bodies)), work, idx, term_buckets=TERM_BUCKETS)
    recs = _corpus(bodies=bodies) + [
        {
            "url": "https://ex.org/a/0000.html",  # sorts before p/
            "warc_ts": dt.datetime(2025, 2, 1),
            "html": b"shared tiny vocab body",
            "text": "shared tiny vocab body",
            "lang": "en",
        }
    ]
    s = update_index(_df(spark, recs), work, idx)
    assert s["route"] == "delta" and s["route_reason"] == "ordering_shift", s
    _assert_view_exact(spark, tmp_path, idx, recs, ["shared", "vocab"], "shift")


def test_auto_compaction_budget(spark, tmp_path):
    work, idx = tmp_path / "w3", tmp_path / "i3"
    update_index(_df(spark, _corpus()), work, idx, term_buckets=TERM_BUCKETS)

    def diffuse(tag):
        return {
            i: f"{tag}{i} spray{tag}{i} wide{tag}{i} common words"
            for i in range(0, N_PAGES, 4)
        }

    # max_segments=1: first delta stays, second trips the budget and
    # compacts everything back into the base.
    s1 = update_index(
        _df(spark, _corpus(mutations=diffuse("aa"))), work, idx,
        max_segments=1, tombstone_ratio=1.0,
    )
    assert s1["route"] == "delta" and s1["compaction"] is None
    s2 = update_index(
        _df(spark, _corpus(mutations=diffuse("bb"))), work, idx,
        max_segments=1, tombstone_ratio=1.0,
    )
    assert s2["route"] == "delta"
    assert s2["compaction"] is not None
    assert s2["compaction"]["trigger"].startswith("segments")
    assert not (idx / "segments").exists()
    _assert_view_exact(
        spark, tmp_path, idx, _corpus(mutations=diffuse("bb")),
        ["common", "sprayaa2"], "compacted",
    )

    # tombstone budget fires independently of layer count
    man = {"segments": [{"n_new": 10, "n_removed": 30}], "base_doc_count": 100}
    assert compaction_due(man, max_segments=4, tombstone_ratio=0.2) is not None
    man2 = {"segments": [{"n_new": 10, "n_removed": 5}], "base_doc_count": 100}
    assert compaction_due(man2, max_segments=4, tombstone_ratio=0.2) is None


def test_measure_change_shape_cost_is_change_bound(spark, tmp_path):
    """The routing signal tokenizes only changed-bucket docs — check it
    reports a small footprint for a one-page tiny-vocab edit and a big
    one for scattered unique-vocab edits."""
    from vexor_spark.index.checkpoint import build_chunks_resumable

    work, idx = tmp_path / "w4", tmp_path / "i4"
    bodies = lambda i: "shared tiny vocab body common words"  # noqa: E731
    update_index(_df(spark, _corpus(bodies=bodies)), work, idx, term_buckets=TERM_BUCKETS)

    cur = {3: "shared tiny vocab body common extra"}
    st = build_chunks_resumable(_df(spark, _corpus(mutations=cur, bodies=bodies)), work)
    changed = sorted(st["stale_buckets"] + st["removed_buckets"])
    shape = measure_change_shape(
        spark, Path(work), Path(idx), changed,
        n_buckets=32, term_buckets=TERM_BUCKETS,
    )
    # one doc: ≤ (6 url tokens + old 6 + new 6) distinct terms
    assert shape["affected_term_buckets"] <= 18
    assert shape["bucket_ratio"] <= 0.25


def test_noop_reports_live_view_docs(spark, tmp_path):
    """Round-5 ADVICE: the noop route must report the LIVE view's doc
    count (base + segment deltas), not the pre-segment base meta."""
    work, idx = tmp_path / "w_noop", tmp_path / "i_noop"
    update_index(_df(spark, _corpus()), work, idx, term_buckets=TERM_BUCKETS)
    cur = _corpus(drop={5})  # removes a page → live count < base count
    s2 = update_index(_df(spark, cur), work, idx, term_buckets=TERM_BUCKETS)
    assert s2["route"] in ("delta", "inplace", "full_rebuild")
    if s2["route"] != "delta":  # the routing test pins shapes; here we
        return  # only care about the segmented-noop report
    s3 = update_index(_df(spark, cur), work, idx, term_buckets=TERM_BUCKETS)
    assert s3["route"] == "noop"
    live = SegmentedIndex(spark, idx).doc_count
    assert s3["docs"] == live


def test_measure_change_shape_sampled_early_exit(spark, tmp_path):
    """diffuse_ratio enables the sampled early-exit: a diffuse change is
    detected from a bounded sample (footprint monotone ⇒ a sample past
    the threshold proves diffuse; `sampled` flags the lower bound), while
    a concentrated change falls through to the exact pass (no flag,
    same numbers as the exact call)."""
    from vexor_spark.index.checkpoint import build_chunks_resumable

    work, idx = tmp_path / "w5", tmp_path / "i5"
    bodies = lambda i: "shared tiny vocab body common words"  # noqa: E731
    update_index(_df(spark, _corpus(bodies=bodies)), work, idx, term_buckets=TERM_BUCKETS)

    # diffuse: scattered unique-vocab edits; sample_docs=2 forces a real
    # subsample at test scale
    cur = {i: f"edited{i} fresh{i} body{i} new{i} zz{i} qq{i}" for i in range(0, N_PAGES, 2)}
    st = build_chunks_resumable(_df(spark, _corpus(mutations=cur, bodies=bodies)), work)
    changed = sorted(st["stale_buckets"] + st["removed_buckets"])
    shape = measure_change_shape(
        spark, Path(work), Path(idx), changed,
        n_buckets=32, term_buckets=TERM_BUCKETS,
        diffuse_ratio=0.05, sample_docs=2,
    )
    assert shape.get("sampled") is True
    assert shape["bucket_ratio"] > 0.05

    # concentrated: one tiny-vocab edit on a FRESH store (reusing the
    # diffuse store would also revert every diffuse edit) — sampled
    # probe stays under the threshold, so the exact pass runs and
    # matches the unsampled call
    work2, idx2 = tmp_path / "w6", tmp_path / "i6"
    update_index(_df(spark, _corpus(bodies=bodies)), work2, idx2, term_buckets=TERM_BUCKETS)
    cur2 = {3: "shared tiny vocab body common extra"}
    st2 = build_chunks_resumable(_df(spark, _corpus(mutations=cur2, bodies=bodies)), work2)
    changed2 = sorted(st2["stale_buckets"] + st2["removed_buckets"])
    exact = measure_change_shape(
        spark, Path(work2), Path(idx2), changed2,
        n_buckets=32, term_buckets=TERM_BUCKETS,
    )
    gated = measure_change_shape(
        spark, Path(work2), Path(idx2), changed2,
        n_buckets=32, term_buckets=TERM_BUCKETS,
        diffuse_ratio=0.25, sample_docs=1024,
    )
    assert "sampled" not in gated
    assert gated["affected_term_buckets"] == exact["affected_term_buckets"]
    assert gated["bucket_ratio"] <= 0.25


def test_diffuse_by_count_guard_skips_probe(spark, tmp_path, monkeypatch):
    """Round-7 retune (2M measurement, BENCH_R07_SCALE
    inplace_sharedvocab_2M): when the dict-only changed-doc estimate
    dwarfs the term-bucket count, update_index routes delta WITHOUT
    paying the shape probe — url tokens alone make such a change
    diffuse. Forced here by shrinking the guard; the default guard
    keeps probing small corpora (every other routing test still
    exercises the probe)."""
    import vexor_spark.index.maintenance as mt

    work, idx = tmp_path / "w", tmp_path / "i"
    update_index(_df(spark, _corpus()), work, idx, term_buckets=TERM_BUCKETS)

    calls = []
    real = mt.measure_change_shape
    monkeypatch.setattr(
        mt, "measure_change_shape",
        lambda *a, **k: calls.append(1) or real(*a, **k),
    )
    monkeypatch.setattr(mt, "DIFFUSE_DOCS_PER_BUCKET", 0)
    s = update_index(
        _df(spark, _corpus(mutations={3: "count guard body"})), work, idx
    )
    assert s["route"] == "delta"
    assert s["route_reason"].startswith("diffuse_by_count")
    assert "shape" not in s
    assert not calls  # the probe never ran
