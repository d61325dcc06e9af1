"""flashrank / remote rerank orchestration parity (round-3 verdict
item 6): the same deterministic fake scorer is injected into the
reference's `_apply_flashrank_rerank` / `_apply_remote_rerank`
(vexor/services/search_service.py:233-278, 378-410) and into this
engine's vexor_spark/rerank.py, and the resulting orderings must be
identical — clamp bounds, document construction, id mapping, score
override, unseen-candidate append, tie handling, truncation."""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from vexor_spark.rerank import (
    RemoteRerankConfig,
    apply_flashrank_order,
    apply_remote_order,
    build_rerank_document,
    extract_remote_rerank_items,
    flashrank_rerank_search,
    normalize_remote_rerank_url,
    remote_rerank_search,
)

REFERENCE = Path("/root/reference")

needs_ref = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout absent"
)


def _ref_search_service():
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import vexor.services.search_service as ss

    return ss


class _DuckResult:
    """Duck-typed stand-in for the reference's SearchResult (its import
    is TYPE_CHECKING-only in search_service, so any object with
    .path/.score/.preview works)."""

    def __init__(self, path: str, score: float, preview: str | None):
        self.path = Path(path)
        self.score = score
        self.preview = preview


def _poly(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % 2147483647
    return acc


def _fake_rank(query: str, passages: list[dict]) -> list[dict]:
    """Deterministic adversarial ranker: pseudo-scores from the shared
    poly hash, every 5th passage dropped, every 7th score withheld
    (None), plus one bogus id the orchestration must skip."""
    scored = [
        (p["id"], (_poly(query + "|" + p["text"]) % 997) / 997.0) for p in passages
    ]
    scored.sort(key=lambda t: (-t[1], t[0]))
    out: list[dict] = []
    for rank_pos, (pid, s) in enumerate(scored):
        if rank_pos % 5 == 4:
            continue  # dropped passage -> must be appended in dense order
        out.append({"id": pid, "score": None if rank_pos % 7 == 6 else s})
    out.append({"id": 999_999, "score": 0.5})  # unknown id -> skipped
    out.append({"id": None, "score": 0.1})  # missing id -> skipped
    return out


CANDS = [
    (i, f"dir{i % 3}/file_{i}.txt", (f"preview {i} spark merge" if i % 4 else None), 1.0 - i * 0.01)
    for i in range(23)
]


@needs_ref
def test_build_rerank_document_parity():
    ss = _ref_search_service()
    for _d, url, prev, score in CANDS + [(99, "bare", None, 0.0)]:
        got = build_rerank_document(url, prev)
        want = ss._build_rerank_document(_DuckResult(url, score, prev))
        assert got == want, (url, prev)


@needs_ref
def test_flashrank_orchestration_parity(monkeypatch):
    ss = _ref_search_service()

    # stub `flashrank` package: Ranker wraps _fake_rank, RerankRequest
    # is a plain holder — injected into the reference's import site.
    class _Req:
        def __init__(self, query, passages):
            self.query, self.passages = query, passages

    class _Ranker:
        def __init__(self, **kwargs):
            pass

        def rerank(self, req):
            return _fake_rank(req.query, req.passages)

    fake_mod = types.ModuleType("flashrank")
    fake_mod.Ranker = _Ranker
    fake_mod.RerankRequest = _Req
    monkeypatch.setitem(sys.modules, "flashrank", fake_mod)
    ss._get_flashranker.cache_clear()

    query = "spark merge window"
    results = [_DuckResult(u, s, p) for (_d, u, p, s) in CANDS]
    ref_out = ss._apply_flashrank_rerank(query, results, None)
    ref_order = [(r.path.as_posix(), round(r.score, 9)) for r in ref_out]

    passages = [
        {"id": i, "text": build_rerank_document(u, p) or u}
        for i, (_d, u, p, _s) in enumerate(CANDS)
    ]
    ours = apply_flashrank_order(query, CANDS, _fake_rank(query, passages))
    our_order = [(u, round(s, 9)) for (_d, u, _p, s) in ours]
    assert our_order == ref_order


REMOTE_PAYLOADS = [
    # normal 'results' shape with edge items the parser must survive
    {
        "results": [
            {"index": 3, "relevance_score": 0.9},
            {"index": "1", "score": 0.8},  # string index -> int()
            {"index": 3, "score": 0.7},  # duplicate -> skipped
            {"index": 50, "score": 0.6},  # out of range -> skipped
            {"index": 0},  # no score -> keep dense score
            {"index": 2, "relevance_score": "nan-ish"},  # unfloatable -> None
            "junk",
            {"score": 0.5},  # no index -> skipped
        ]
    },
    {"data": [{"index": 2, "score": 0.4}, {"index": 0, "score": 0.3}]},
    {"results": "not-a-list", "data": [{"index": 1, "relevance_score": 1.5}]},
    {"unrelated": 1},  # no items -> candidates unchanged
    [],  # non-dict payload
]


@needs_ref
@pytest.mark.parametrize("payload_idx", range(len(REMOTE_PAYLOADS)))
def test_remote_orchestration_parity(monkeypatch, payload_idx):
    ss = _ref_search_service()
    from vexor.config import RemoteRerankConfig as RefCfg

    payload = REMOTE_PAYLOADS[payload_idx]
    body = json.dumps(payload).encode()

    class _Resp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return body

    class _UrlReq:
        @staticmethod
        def Request(url, data=None, method=None):
            req = types.SimpleNamespace(url=url, data=data, method=method)
            req.add_header = lambda *a: None
            return req

        @staticmethod
        def urlopen(req):
            return _Resp()

    monkeypatch.setattr(ss, "urlrequest", _UrlReq)

    query = "hash join"
    sub = CANDS[:6]
    results = [_DuckResult(u, s, p) for (_d, u, p, s) in sub]
    cfg = RefCfg(base_url="http://svc.example/v1", api_key="k", model="m")
    ref_out = ss._apply_remote_rerank(query, results, cfg)
    ref_order = [(r.path.as_posix(), round(r.score, 9)) for r in ref_out]

    items = extract_remote_rerank_items(payload)
    assert items == ss._extract_remote_rerank_items(payload)
    ours = apply_remote_order(sub, items)
    our_order = [(u, round(s, 9)) for (_d, u, _p, s) in ours]
    assert our_order == ref_order


@needs_ref
def test_normalize_remote_url_parity():
    from vexor.config import normalize_remote_rerank_url as ref_norm

    cases = [
        None, "", "  ", "http://h/v1", "http://h/v1/", "http://h/v1/rerank",
        "http://h/v1/reranker", "http://h", "host.without.scheme/v2",
        "host/rerank", "https://h:8080/a/b/", "ftp://h/x",
    ]
    for c in cases:
        assert normalize_remote_rerank_url(c) == ref_norm(c), c


@pytest.fixture(scope="module")
def small_index(spark):
    from vexor_spark.index.build import build_index
    from vexor_spark.sources.corpus import generate_pages_df

    pages = generate_pages_df(spark, 40, edges=True, partitions=2)
    idx = build_index(pages, salt_partitions=2, term_buckets=4)
    yield idx
    idx.docs.unpersist()
    idx.postings.unpersist()


def test_search_rerank_arms_integration(small_index):
    # flashrank arm with injected ranker
    df = small_index.search(
        "spark merge", k=5, rerank="flashrank", rerank_kwargs={"ranker": _fake_rank}
    )
    rows = df.collect()
    assert 0 < len(rows) <= 5
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0]["url"]  # meta decoration survives

    # identical to calling the arm directly
    direct = flashrank_rerank_search(
        small_index, "spark merge", 5, ranker=_fake_rank
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in direct
    ]

    # remote arm with injected transport; empty parse keeps dense order
    sent = {}

    def transport(cfg, payload):
        sent.update(payload)
        sent["url"] = cfg.base_url
        return {"results": [{"index": 1, "relevance_score": 2.0}, {"index": 0}]}

    cfg = RemoteRerankConfig(base_url="http://svc/v1", model="m", api_key="k")
    df2 = small_index.search(
        "spark merge", k=5, rerank="remote",
        rerank_kwargs={"config": cfg, "transport": transport},
    )
    rows2 = df2.collect()
    assert len(rows2) > 1
    assert sent["url"] == "http://svc/v1/rerank"  # normalized
    assert sent["model"] == "m" and sent["query"] == "spark merge"
    assert len(sent["documents"]) == 20  # clamp max(20, min(2k,150))

    # config gating mirrors the reference: missing pieces raise
    with pytest.raises(RuntimeError):
        remote_rerank_search(small_index, "q", 5, config=None)
    with pytest.raises(RuntimeError):
        remote_rerank_search(
            small_index, "q", 5, config=RemoteRerankConfig(base_url="http://x")
        )
    with pytest.raises(ValueError):
        small_index.search("q", k=5, rerank="nope")


def test_remote_env_key_fallback(monkeypatch, small_index):
    from vexor_spark.rerank import REMOTE_RERANK_ENV

    monkeypatch.setenv(REMOTE_RERANK_ENV, "env-key")
    seen = {}

    def transport(cfg, payload):
        seen["key"] = cfg.api_key
        return {}

    remote_rerank_search(
        small_index, "spark", 3,
        config=RemoteRerankConfig(base_url="http://x", model="m"),
        transport=transport,
    )
    assert seen["key"] == "env-key"


def test_filters_compose_with_rerank_arms(small_index):
    """ADVICE r4 (medium): url_prefix / exclude_patterns / round_dp
    must compose with every rerank arm — the reference applies rerank
    to the already-filtered result list, so the filtered doc set feeds
    the arms' candidate generation."""
    prefix = "https://example.org/spark/"
    for arm, kw in [
        ("bm25", {}),
        ("hybrid", {}),
        ("flashrank", {"ranker": _fake_rank}),
    ]:
        rows = small_index.search(
            "spark merge", k=5, rerank=arm, rerank_kwargs=kw, url_prefix=prefix
        ).collect()
        assert rows, arm
        assert all(r["url"].startswith(prefix) for r in rows), arm

    # exclude_patterns (gitignore grammar over the url's root-relative
    # path): drop everything under spark/
    rows = small_index.search(
        "spark merge", k=5, rerank="bm25", exclude_patterns=["spark/"]
    ).collect()
    assert rows
    assert all(not r["url"].startswith(prefix) for r in rows)

    # round_dp rounds the arm's final scores
    rows = small_index.search(
        "spark merge", k=5, rerank="bm25", round_dp=2
    ).collect()
    assert all(abs(r["score"] * 100 - round(r["score"] * 100)) < 1e-9 for r in rows)

    # composition matches calling the arm directly on the allowed set
    from vexor_spark.retrieval import weighted_rerank_search

    allowed = small_index.docs.filter(
        F.col("url").startswith(prefix)
    ).select("doc_id")
    direct = weighted_rerank_search(
        small_index, "spark merge", 5, allowed=allowed
    ).collect()
    via_search = small_index.search(
        "spark merge", k=5, rerank="bm25", url_prefix=prefix
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in via_search] == [
        (r["doc_id"], r["score"]) for r in direct
    ]
