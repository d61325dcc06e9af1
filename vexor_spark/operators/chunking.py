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


def make_chunk_pages_udf(
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    char_limit: int = FULL_CHAR_LIMIT,
):
    """(url, html) -> array<chunk struct> pandas UDF (full mode)."""

    @F.pandas_udf(ArrayType(CHUNK_STRUCT))
    def chunk_pages(url: pd.Series, html: pd.Series) -> pd.Series:
        def one(u: str, data: bytes | None) -> list[dict]:
            name = _page_name(u)
            text = extract_text_py(data, char_limit)
            payloads: list[dict] = []
            if text is not None:
                for cleaned, start_line, end_line in _full_chunks(text, chunk_size, overlap):
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
            if not payloads:
                # Name fallback (vexor/modes.py:55-58, 100-103)
                payloads.append(
                    {
                        "chunk_index": 0,
                        "label": name.replace("_", " "),
                        "preview": name,
                        "start_line": None,
                        "end_line": None,
                    }
                )
            return payloads

        return pd.Series([one(u, h) for u, h in zip(url, html)])

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
) -> DataFrame:
    """pages(url, html, ...) → chunks(url, chunk_index, label, preview,
    start_line, end_line[, extra...]). `document` (the BM25 lexical text,
    bm25.py:54-57) is added as `url || ' ' || label` JVM-side.
    """
    udf = make_chunk_pages_udf(chunk_size, overlap, char_limit)
    keep: list[Column | str] = [url_col] + (extra_cols or [])
    exploded = (
        pages.select(*keep, F.explode(udf(F.col(url_col), F.col(html_col))).alias("c"))
        .select(*keep, "c.*")
        .withColumn("document", F.concat_ws(" ", F.col(url_col), F.col("label")))
    )
    return exploded
