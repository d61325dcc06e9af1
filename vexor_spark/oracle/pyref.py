"""Reference-semantics oracle (pure Python, single-machine, test-only).

Each function documents the reference location whose observable behavior
it reproduces. The Spark engine under test must match this module:
byte-identical extracted text, identical postings/doclen/stats, and
rank-identical BM25 top-k (scores within 1e-9 rel).
"""

from __future__ import annotations

import codecs
import math
import re
from collections import Counter
from typing import Mapping, Sequence

from vexor_spark.constants import (
    BM25_B,
    BM25_K1,
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    FULL_CHAR_LIMIT,
    MAX_QUERY_TERMS,
    PREVIEW_CHAR_LIMIT,
    RRF_BM25_WEIGHT,
    RRF_DENSE_WEIGHT,
    RRF_K,
    SCORE_ROUND_DP,
    TOKEN_PATTERN,
    UTF8_BYTE_MULTIPLIER,
)

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> list[str]:
    """Pinned regex tokenizer path (vexor/bm25.py:33-36 fallback arm)."""
    return _TOKEN_RE.findall(text.lower())


def build_document(url: str, label: str) -> str:
    """Canonical lexical document for a chunk (vexor/bm25.py:54-57)."""
    return f"{url} {label}"


def term_frequencies(tokens: Sequence[str]) -> dict[str, int]:
    """vexor/bm25.py:60-61."""
    return dict(Counter(tokens))


def prepare_query_terms(query: str) -> list[str]:
    """Tokenize + order-preserving dedup + cap at MAX_QUERY_TERMS
    (vexor/services/search_service.py:588-590, vexor/bm25.py:19)."""
    return list(dict.fromkeys(tokenize(query)))[:MAX_QUERY_TERMS]


def score_postings(
    query_terms: Sequence[str],
    postings: Mapping[str, Sequence[tuple[int, int, int]]],
    doc_count: int,
    avg_doc_len: float,
) -> dict[int, float]:
    """Non-negative-idf Okapi BM25 (vexor/bm25.py:64-89).

    postings: term -> [(doc_id, tf, doc_len), ...].
    """
    if doc_count <= 0 or avg_doc_len <= 0:
        return {}
    scores: dict[int, float] = {}
    for term in query_terms:
        term_postings = postings.get(term, ())
        if not term_postings:
            continue
        df = len(term_postings)
        idf = math.log((doc_count - df + 0.5) / (df + 0.5) + 1.0)
        for doc_id, tf, doc_len in term_postings:
            denominator = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doc_len / avg_doc_len)
            if denominator <= 0:
                continue
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf * (BM25_K1 + 1.0) / denominator
    return scores


def top_k(scores: Mapping[int, float], k: int) -> list[tuple[int, float]]:
    """Deterministic top-k: (-score, doc_id) key
    (vexor/services/search_service.py:176-182)."""
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def rrf_fuse(
    dense_order: Sequence[int],
    bm25_scores_by_doc: Mapping[int, float],
    *,
    k: int = RRF_K,
) -> dict[int, float]:
    """Weighted reciprocal-rank fusion (vexor/bm25.py:92-115).

    dense_order: doc ids in dense-rank order (best first). BM25 ranking is
    positive scores sorted by (-score, doc_id). Returns doc -> fused score.
    """
    fused: dict[int, float] = {}
    for rank, doc in enumerate(dense_order, start=1):
        fused[doc] = fused.get(doc, 0.0) + RRF_DENSE_WEIGHT * (k + 1.0) / (k + rank)
    bm25_order = sorted(
        ((doc, s) for doc, s in bm25_scores_by_doc.items() if s > 0),
        key=lambda item: (-item[1], item[0]),
    )
    for rank, (doc, _s) in enumerate(bm25_order, start=1):
        fused[doc] = fused.get(doc, 0.0) + RRF_BM25_WEIGHT * (k + 1.0) / (k + rank)
    return fused


def normalize_by_max(scores: Sequence[float]) -> list[float]:
    """vexor/services/search_service.py:162-168."""
    if not scores:
        return []
    mx = max(scores)
    if mx <= 0:
        return [0.0 for _ in scores]
    return [s / mx for s in scores]


# --- extraction (byte-identity contract) ---------------------------------


def decode_utf8_head(data: bytes, char_limit: int) -> str | None:
    """Incremental UTF-8 decode of the first char_limit*4 bytes
    (content_extract_service.py:749-768). Returns None on decode error
    or empty result; trailing incomplete sequences are dropped silently.
    """
    if char_limit > 0:
        data = data[: char_limit * UTF8_BYTE_MULTIPLIER]
    try:
        text = codecs.getincrementaldecoder("utf-8")().decode(data, final=False)
    except UnicodeDecodeError:
        return None
    if text == "":
        return None
    if char_limit > 0:
        return text[:char_limit]
    return text


def charset_fallback(data: bytes) -> str | None:
    """Non-UTF-8 arm: charset_normalizer best() over the FULL payload —
    the reference's from_path reads the whole file
    (content_extract_service.py:731-741)."""
    try:
        from charset_normalizer import from_bytes
    except Exception:  # pragma: no cover
        return None
    try:
        result = from_bytes(data)
    except Exception:
        return None
    if result is None or not len(result):
        return None
    best = result.best()
    if best is None:
        return None
    return str(best) or None


def extract_text(html: bytes, char_limit: int = FULL_CHAR_LIMIT) -> str | None:
    """The `text` column contract: decode+cap (content_extract_service.py
    :726-747 `_read_text_full`, UTF-8 arm + charset_normalizer fallback),
    then CRLF-normalize + strip (content_extract_service.py:200 in
    `extract_full_chunks_with_lines`).
    """
    text = decode_utf8_head(html, char_limit)
    if text is None:
        # The UTF-8 arm returns None on decode error AND empty decode;
        # both take the fallback (content_extract_service.py:725-748).
        text = charset_fallback(html)
        if text is not None and char_limit > 0:
            text = text[:char_limit]
    if not text:
        return None
    normalized = text.replace("\r\n", "\n").strip()
    return normalized if normalized else None


def cleanup_snippet(snippet: str) -> str | None:
    """content_extract_service.py:876-879."""
    lines = [line.strip() for line in snippet.splitlines() if line.strip()]
    joined = " ".join(lines)
    return joined or None


def trim_preview(text: str, limit: int = PREVIEW_CHAR_LIMIT) -> str:
    """vexor/modes.py:318-322."""
    stripped = text.strip()
    if len(stripped) <= limit:
        return stripped
    return stripped[: limit - 1].rstrip() + "…"


def chunk_full(
    text: str,
    *,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[dict]:
    """`full`-mode sliding windows with line ranges over already-extracted
    text (content_extract_service.py:170-231). Input here is the
    normalized `text` (CRLF-normalized + stripped); emits one dict per
    non-blank window: {chunk_index, text, start_line, end_line}.
    chunk_index counts emitted windows (vexor/modes.py:104-121).
    """
    normalized = text.replace("\r\n", "\n").strip()
    if not normalized:
        return []
    size = max(int(chunk_size), 1)
    stride = max(size - max(int(overlap), 0), 1)
    newline_positions = [i for i, ch in enumerate(normalized) if ch == "\n"]
    import bisect

    chunks: list[dict] = []
    start = 0
    length = len(normalized)
    while start < length:
        end = min(start + size, length)
        window = normalized[start:end]
        cleaned = window.strip()
        if cleaned:
            leading = len(window) - len(window.lstrip())
            trailing = len(window) - len(window.rstrip())
            span_start = min(start + leading, length)
            span_end = max(span_start, end - trailing)
            start_line = bisect.bisect_left(newline_positions, span_start) + 1
            last_index = max(span_start, span_end - 1)
            end_line = bisect.bisect_left(newline_positions, last_index) + 1
            chunks.append(
                {
                    "chunk_index": len(chunks),
                    "text": cleaned,
                    "start_line": start_line,
                    "end_line": end_line,
                }
            )
        if end >= length:
            break
        start += stride
    return chunks


def normalize_preview_chunk(text: str) -> str | None:
    """vexor/modes.py:325-330."""
    lines = [line.strip() for line in text.splitlines() if line.strip()]
    if lines:
        return " ".join(lines)
    stripped = text.strip()
    return stripped or None


def full_mode_payloads(url: str, text: str) -> list[dict]:
    """`full` strategy per page (vexor/modes.py:85-124): windows →
    normalized label "{name} [#i] :: {snippet}", preview trimmed; doc is
    build_document(url, label). chunk_index = emitted-window ordinal.
    name = last path segment of the url (stands in for file.name).
    """
    name = url.rstrip("/").rsplit("/", 1)[-1] or url
    payloads: list[dict] = []
    for chunk in chunk_full(text):
        normalized = normalize_preview_chunk(chunk["text"])
        if not normalized:
            continue
        label = f"{name} [#{len(payloads) + 1}] :: {normalized}"
        payloads.append(
            {
                "url": url,
                "chunk_index": len(payloads),
                "label": label,
                "preview": trim_preview(normalized),
                "start_line": chunk["start_line"],
                "end_line": chunk["end_line"],
            }
        )
    if not payloads:
        name_label = name.replace("_", " ")
        payloads.append(
            {
                "url": url,
                "chunk_index": 0,
                "label": name_label,
                "preview": name,
                "start_line": None,
                "end_line": None,
            }
        )
    return payloads


def build_corpus_index(pages: Sequence[tuple[str, bytes]]) -> dict:
    """End-to-end oracle index over (url, html) pages: extract → chunk →
    doc ids by (url asc, chunk_index asc) (SURVEY §1.4) → postings.

    Returns {docs, postings, doc_count, avg_doc_len} where docs is
    [(doc_id, url, chunk_index, label, doc_len)] and postings is
    term -> [(doc_id, tf, doc_len)] sorted by doc_id.
    """
    rows: list[dict] = []
    for url, html in sorted(pages, key=lambda p: p[0]):
        text = extract_text(html)
        if text is None:
            # Reference: extractor returns None → no chunks → name fallback
            payloads = full_mode_payloads(url, "")
        else:
            payloads = full_mode_payloads(url, text)
        rows.extend(payloads)
    docs = []
    previews = []
    postings: dict[str, list[tuple[int, int, int]]] = {}
    for doc_id, payload in enumerate(rows):
        document = build_document(payload["url"], payload["label"])
        tokens = tokenize(document)
        doc_len = len(tokens)
        docs.append((doc_id, payload["url"], payload["chunk_index"], payload["label"], doc_len))
        previews.append(payload["preview"])
        for term, tf in term_frequencies(tokens).items():
            postings.setdefault(term, []).append((doc_id, tf, doc_len))
    doc_count = len(docs)
    avg_doc_len = (sum(d[4] for d in docs) / doc_count) if doc_count else 0.0
    return {
        "docs": docs,
        "previews": previews,
        "postings": postings,
        "doc_count": doc_count,
        "avg_doc_len": avg_doc_len,
    }


LETTERS = "abcdefghijklmnopqrstuvwxyz"


def letter_cosine(text: str, query: str) -> float:
    """Deterministic dense backend: letter-count cosine — the
    reference's test oracle (tests/integration/test_end_to_end.py:15-30).
    """
    a = [text.lower().count(ch) for ch in LETTERS]
    b = [query.lower().count(ch) for ch in LETTERS]
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    if na == 0 or nb == 0:
        return 0.0
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


def hybrid_search(index: dict, query: str, k: int = 10) -> list[tuple[int, float]]:
    """RRF hybrid arm: dense letter-cosine order over labels + BM25,
    fused per bm25.py:92-115, top-k by (-fused, doc_id)."""
    dense = sorted(
        ((d[0], letter_cosine(d[3], query)) for d in index["docs"]),
        key=lambda kv: (-kv[1], kv[0]),
    )
    dense_order = [doc for doc, _ in dense]
    terms = prepare_query_terms(query)
    bm25 = score_postings(terms, index["postings"], index["doc_count"], index["avg_doc_len"])
    fused = rrf_fuse(dense_order, bm25)
    return top_k(fused, k)


def bm25l_scores(
    query_terms: Sequence[str],
    docs_tokens: Sequence[Sequence[str]],
) -> list[float]:
    """BM25L over a candidate micro-corpus (rank_bm25's BM25L — the
    reference's actual dependency, search_service.py:185-196):
    idf = ln((N+1)/(df+0.5)); ctd = tf/(1-b+b·dl/avgdl);
    s += idf·(k1+1)·(ctd+δ)/(k1+ctd+δ), δ = 0.5, summed over EVERY
    query token — including tf=0 docs, which receive the nonzero
    baseline idf·(k1+1)·δ/(k1+δ) per term (rank_bm25's get_scores adds
    the (ctd+δ)/(k1+ctd+δ) factor for all docs; only terms absent from
    the whole corpus contribute 0 via `idf.get(q) or 0`)."""
    n = len(docs_tokens)
    if n == 0:
        return []
    avgdl = sum(len(t) for t in docs_tokens) / n
    df: dict[str, int] = {}
    for toks in docs_tokens:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    delta = 0.5
    out = []
    for toks in docs_tokens:
        counts = Counter(toks)
        dl = len(toks)
        s = 0.0
        for q in query_terms:
            if q not in df:
                continue  # idf.get(q) or 0 → zero contribution
            tf = counts.get(q, 0)
            idf = math.log((n + 1) / (df[q] + 0.5))
            # avgdl == 0 ⇒ every doc is empty; rank_bm25 would 0/0 here,
            # we pin ctd = 0 (all docs then share the pure baseline).
            ctd = tf / (1 - BM25_B + BM25_B * dl / avgdl) if avgdl > 0 else 0.0
            s += idf * (BM25_K1 + 1.0) * (ctd + delta) / (BM25_K1 + ctd + delta)
        out.append(s)
    return out


def weighted_rerank_search(index: dict, query: str, k: int = 10) -> list[tuple[int, float]]:
    """Legacy `rerank=bm25` arm (search_service.py:199-218): dense
    candidate clamp max(20, min(2k, 150)), rerank doc
    "{name} {url} {preview}".strip(), 0.7·sem_norm + 0.3·bm25l_norm,
    stable sort desc (ties keep dense order)."""
    n_cand = max(20, min(2 * k, 150))
    previews = {d[0]: p for d, p in zip(index["docs"], index.get("previews", []))}
    dense = sorted(
        ((d[0], letter_cosine(d[3], query), d[1]) for d in index["docs"]),
        key=lambda kv: (-kv[1], kv[0]),
    )[:n_cand]
    qtoks = tokenize(query)
    if not qtoks:
        return [(doc, s) for doc, s, _ in dense[:k]]
    docs_tokens = []
    for doc, _s, url in dense:
        name = url.rstrip("/").rsplit("/", 1)[-1] or url
        preview = previews.get(doc) or ""
        docs_tokens.append(tokenize(f"{name} {url} {preview}".strip()))
    # NOTE: the legacy arm passes the RAW query token list (duplicates
    # included, no 32-cap) to BM25L (search_service.py:203-208).
    bm = bm25l_scores(qtoks, docs_tokens)
    sem = [max(s, 0.0) for _, s, _ in dense]
    sem_n = normalize_by_max(sem)
    bm_n = normalize_by_max(bm)
    fused = [
        (doc, 0.7 * sn + 0.3 * bn)
        for (doc, _s, _u), sn, bn in zip(dense, sem_n, bm_n)
    ]
    fused.sort(key=lambda kv: -kv[1])  # stable: ties keep dense order
    return fused[:k]


def search(
    index: dict, query: str, k: int = 10, *, round_dp: int | None = SCORE_ROUND_DP
) -> list[tuple[int, float]]:
    """BM25 top-k over a build_corpus_index() result.

    Ranks on SCORE_ROUND_DP-rounded scores by default — the engine's
    public ranking contract (round-7): raw float sums are shuffle-order
    dependent at the ulp level, so every public search arm rounds
    before ranking and breaks ties by doc_id. Pass round_dp=None for
    the raw-score order (k-boundary-tolerant comparisons only)."""
    terms = prepare_query_terms(query)
    scores = score_postings(terms, index["postings"], index["doc_count"], index["avg_doc_len"])
    if round_dp is not None:
        scores = {d: round(s, round_dp) for d, s in scores.items()}
    return top_k(scores, k)


def search_filtered(
    index: dict, query: str, k: int, url_prefix: str,
    *, round_dp: int | None = SCORE_ROUND_DP,
) -> list[tuple[int, float]]:
    """Post-hoc filter semantics (F5/O6): full-corpus df/avgdl, results
    narrowed to docs whose url starts with the prefix, then top-k (on
    rounded scores by default — same contract as search())."""
    terms = prepare_query_terms(query)
    scores = score_postings(terms, index["postings"], index["doc_count"], index["avg_doc_len"])
    allowed = {d[0] for d in index["docs"] if d[1].startswith(url_prefix)}
    kept = {doc: s for doc, s in scores.items() if doc in allowed}
    if round_dp is not None:
        kept = {d: round(s, round_dp) for d, s in kept.items()}
    return top_k(kept, k)
