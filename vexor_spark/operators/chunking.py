"""Pages → indexable chunks (the `full` indexing mode, the primary mode
for web pages per SURVEY §2.8).

Semantics: vexor/modes.py:81-124 (FullStrategy) over
content_extract_service.py:170-231 (sliding windows + line ranges), with
name-fallback when extraction yields nothing. One Arrow-batched pandas
UDF produces an array of chunk structs per page which is then exploded
JVM-side — Python string semantics (unicode strip/splitlines) are the
byte-identity contract, so they stay in Python; everything relational
around them is built-in.
"""

from __future__ import annotations

import bisect

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from vexor_spark.constants import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    FULL_CHAR_LIMIT,
    PREVIEW_CHAR_LIMIT,
)
from vexor_spark.functions.text import extract_text_py

CHUNK_STRUCT = StructType(
    [
        StructField("chunk_index", IntegerType()),
        StructField("label", StringType()),
        StructField("preview", StringType()),
        StructField("start_line", IntegerType()),
        StructField("end_line", IntegerType()),
    ]
)


def _trim_preview(text: str, limit: int = PREVIEW_CHAR_LIMIT) -> str:
    stripped = text.strip()
    if len(stripped) <= limit:
        return stripped
    return stripped[: limit - 1].rstrip() + "…"


def _normalize_preview_chunk(text: str) -> str | None:
    lines = [line.strip() for line in text.splitlines() if line.strip()]
    if lines:
        return " ".join(lines)
    stripped = text.strip()
    return stripped or None


def _full_chunks(text: str, chunk_size: int, overlap: int) -> list[tuple[str, int, int]]:
    """Sliding windows + line ranges (content_extract_service.py:204-231)."""
    normalized = text.replace("\r\n", "\n").strip()
    if not normalized:
        return []
    size = max(int(chunk_size), 1)
    stride = max(size - max(int(overlap), 0), 1)
    newline_positions = [i for i, ch in enumerate(normalized) if ch == "\n"]
    out: list[tuple[str, int, int]] = []
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
            out.append((cleaned, start_line, end_line))
        if end >= length:
            break
        start += stride
    return out


def _page_name(url: str) -> str:
    seg = url.rstrip("/").rsplit("/", 1)[-1]
    return seg or url


# --- head/brief mode primitives (exact reference semantics) ----------------

HEAD_CHAR_LIMIT = 1000
BRIEF_CHAR_LIMIT = 4000
BRIEF_KEYWORD_LIMIT = 20
BRIEF_PREVIEW_LIMIT = 10
AUTO_FULL_MAX_BYTES = 10_000

_WORD_RE = __import__("re").compile(r"[A-Za-z][A-Za-z0-9_-]+")
_CJK_RE = __import__("re").compile(r"[一-鿿]{2,}")
# keyword_service.py:17-64 stopword sets, verbatim semantics
_STOPWORDS = {
    "the", "and", "for", "are", "with", "this", "that", "from", "have",
    "will", "should", "must", "need", "user", "users", "data", "when",
    "your", "their", "about", "into", "which", "within", "where",
    "while", "there", "only", "each", "more", "than", "also", "such",
    "shall", "can", "may", "our", "per", "any", "all", "like", "been",
    "over", "ensure", "including", "include",
}
_STOPWORDS_ZH = {"的", "了", "和", "或", "及", "需要", "支持", "功能", "用户", "系统"}


def _cleanup_snippet(snippet: str) -> str | None:
    """content_extract_service.py:876-879."""
    lines = [line.strip() for line in snippet.splitlines() if line.strip()]
    joined = " ".join(lines)
    return joined or None


def _decode_head(data: bytes | None, char_limit: int) -> str | None:
    """_read_text_head: UTF-8 arm (decode+cap) with charset_normalizer
    fallback over the full payload, then cleanup
    (content_extract_service.py:700-723)."""
    import codecs

    from vexor_spark.functions.text import charset_fallback_py

    if data is None:
        return None
    capped = data[: char_limit * 4]
    try:
        text = codecs.getincrementaldecoder("utf-8")().decode(capped, final=False)
    except UnicodeDecodeError:
        text = None
    if not text:
        # UTF-8 arm None on error AND empty decode; both take the
        # fallback (content_extract_service.py:700-723).
        text = charset_fallback_py(data)
        if not text:
            return None
    return _cleanup_snippet(text[:char_limit])


def _extract_keywords(text: str, limit: int = BRIEF_KEYWORD_LIMIT) -> list[str]:
    """keyword_service.py:77-107 verbatim semantics: lowercased word
    counts (len>=3, minus stopwords) + CJK runs, top-N by frequency with
    first-seen display form and insertion-ordered ties."""
    from collections import Counter

    display_map: dict[str, str] = {}
    counter: Counter = Counter()
    for match in _WORD_RE.finditer(text):
        raw = match.group(0)
        key = raw.lower()
        if len(key) < 3 or key in _STOPWORDS:
            continue
        counter[key] += 1
        display_map.setdefault(key, raw)
    for match in _CJK_RE.finditer(text):
        token = match.group(0)
        if token in _STOPWORDS_ZH:
            continue
        counter[token] += 1
        display_map.setdefault(token, token)
    return [display_map.get(k, k) for k, _ in counter.most_common(limit)]


def chunk_page_py(
    url: str,
    data: bytes | None,
    *,
    mode: str = "full",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    char_limit: int = FULL_CHAR_LIMIT,
) -> list[dict]:
    """One page → payloads for the given indexing mode (SURVEY §2.8).

    Modes: full (vexor/modes.py:81-124), head (:61-75), name (:49-58),
    brief (:269-293), code (:127-180), outline (:183-225), auto
    (:230-266 — suffix routes .py/.js-family → code, .md-family →
    outline, else by size: ≤10 000 bytes → full, else head).
    """
    from vexor_spark.operators.code_chunking import (
        CODE_SUFFIXES_JS,
        CODE_SUFFIXES_PY,
        OUTLINE_SUFFIXES,
        TEXT_EXTENSIONS,
        code_payloads,
        outline_payloads,
        url_suffix,
    )

    name = _page_name(url)

    def name_fallback() -> list[dict]:
        return [
            {
                "chunk_index": 0,
                "label": name.replace("_", " "),
                "preview": name,
                "start_line": None,
                "end_line": None,
            }
        ]

    if mode == "auto":
        suffix = url_suffix(url)
        if suffix in CODE_SUFFIXES_PY or suffix in CODE_SUFFIXES_JS:
            mode = "code"
        elif suffix in OUTLINE_SUFFIXES:
            mode = "outline"
        else:
            size = len(data) if data is not None else 0
            mode = "full" if size <= AUTO_FULL_MAX_BYTES else "head"

    if mode == "code":
        payloads = code_payloads(
            name,
            data,
            url_suffix(url),
            chunk_size=chunk_size,
            overlap=overlap,
            char_limit=char_limit,
        )
        if payloads is not None:
            return payloads
        # CodeStrategy.fallback is FullStrategy (modes.py:133,146-149),
        # whose extraction only runs for TEXT_EXTENSIONS suffixes
        # (content_extract_service.py:138-149) — else name payload.
        mode = "full" if url_suffix(url) in TEXT_EXTENSIONS else "name"

    if mode == "outline":
        payloads = outline_payloads(name, data, char_limit=char_limit)
        if payloads is not None:
            return payloads
        # OutlineStrategy.fallback, same TEXT_EXTENSIONS gate
        # (modes.py:187,205-207).
        mode = "full" if url_suffix(url) in TEXT_EXTENSIONS else "name"

    if mode == "name":
        return name_fallback()

    # Binary document formats (S5): suffix-dispatched gated extractors
    # (functions/extractors.py). With the parser libs absent they return
    # None and every mode takes the same name fallback the reference
    # takes (content_extract_service.py extractor registry + :138-149).
    from vexor_spark.functions.extractors import BINARY_EXTRACTORS

    binary_fn = BINARY_EXTRACTORS.get(url_suffix(url))

    def head_snippet(limit: int) -> str | None:
        if binary_fn is not None:
            text = binary_fn(data, limit) if data is not None else None
            return text  # extractor output is already snippet-cleaned
        return _decode_head(data, limit)

    if mode == "head":
        snippet = head_snippet(HEAD_CHAR_LIMIT)
        if snippet:
            return [
                {
                    "chunk_index": 0,
                    "label": f"{name} :: {snippet}",
                    "preview": _trim_preview(snippet),
                    "start_line": None,
                    "end_line": None,
                }
            ]
        return name_fallback()

    if mode == "brief":
        snippet = head_snippet(BRIEF_CHAR_LIMIT)
        keywords = _extract_keywords(snippet, BRIEF_KEYWORD_LIMIT) if snippet else []
        if keywords:
            preview_tokens = keywords[:BRIEF_PREVIEW_LIMIT]
            return [
                {
                    "chunk_index": 0,
                    "label": f"{name} :: {' '.join(preview_tokens)}",
                    "preview": ", ".join(preview_tokens),
                    "start_line": None,
                    "end_line": None,
                }
            ]
        return name_fallback()

    if mode != "full":
        raise ValueError(f"unknown mode {mode!r}")

    # full mode: binary formats extract via the gated kernel and carry
    # no line metadata (extract_full_chunks_with_lines include_lines is
    # False outside TEXT_EXTENSIONS, content_extract_service.py:181-199).
    include_lines = binary_fn is None
    if binary_fn is not None:
        text = binary_fn(data, char_limit) if data is not None else None
    else:
        text = extract_text_py(data, char_limit)
    payloads: list[dict] = []
    if text is not None:
        for cleaned, start_line, end_line in _full_chunks(text, chunk_size, overlap):
            if not include_lines:
                start_line = end_line = None
            normalized = _normalize_preview_chunk(cleaned)
            if not normalized:
                continue
            payloads.append(
                {
                    "chunk_index": len(payloads),
                    # vexor/modes.py:110 — "[#i]" is 1-based window ordinal
                    "label": f"{name} [#{len(payloads) + 1}] :: {normalized}",
                    "preview": _trim_preview(normalized),
                    "start_line": start_line,
                    "end_line": end_line,
                }
            )
    return payloads or name_fallback()


def make_chunk_pages_udf(
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    char_limit: int = FULL_CHAR_LIMIT,
    mode: str = "full",
):
    """(url, html) -> array<chunk struct> pandas UDF for a mode."""

    @F.pandas_udf(ArrayType(CHUNK_STRUCT))
    def chunk_pages(url: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series(
            [
                chunk_page_py(
                    u, h, mode=mode, chunk_size=chunk_size,
                    overlap=overlap, char_limit=char_limit,
                )
                for u, h in zip(url, html)
            ]
        )

    return chunk_pages


def chunk_pages(
    pages: DataFrame,
    *,
    url_col: str = "url",
    html_col: str = "html",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    char_limit: int = FULL_CHAR_LIMIT,
    extra_cols: list[str] | None = None,
    mode: str = "full",
) -> DataFrame:
    """pages(url, html, ...) → chunks(url, chunk_index, label, preview,
    start_line, end_line[, extra...]). `document` (the BM25 lexical text,
    bm25.py:54-57) is added as `url || ' ' || label` JVM-side.
    """
    udf = make_chunk_pages_udf(chunk_size, overlap, char_limit, mode)
    keep: list[Column | str] = [url_col] + (extra_cols or [])
    # NOTE: `document` (url + " " + label) is NOT materialized here — it
    # duplicates the label bytes and would be persisted/shuffled through
    # doc-id assignment; callers derive it with with_document() after.
    return pages.select(
        *keep, F.explode(udf(F.col(url_col), F.col(html_col))).alias("c")
    ).select(*keep, "c.*")


def with_document(chunks: DataFrame, url_col: str = "url") -> DataFrame:
    """Add the BM25 lexical document column (bm25.py:54-57)."""
    return chunks.withColumn(
        "document", F.concat_ws(" ", F.col(url_col), F.col("label"))
    )
