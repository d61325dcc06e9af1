"""Text extraction + presentation columns.

`extract_text_udf` is the one genuinely-Python piece of the ingest path:
incremental UTF-8 decode with a byte-bounded read and char cap
(content_extract_service.py:749-768) cannot be expressed with built-in
expressions without changing semantics (Spark's CAST(binary AS string)
replaces invalid bytes instead of rejecting the row, can't drop a
trailing incomplete multi-byte sequence, and JVM trim/regex whitespace
classes differ from Python's unicode-aware str.strip()/splitlines() that
define the byte-identity contract). It is an Arrow-batched pandas UDF —
vectorized batches, no per-row Python from Spark's perspective.

The `*_col` helpers are JVM-side equivalents used where inputs are known
ASCII-safe (the driver's `documents` table) so those query plans stay
entirely inside whole-stage codegen.
"""

from __future__ import annotations

import codecs

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from vexor_spark.constants import FULL_CHAR_LIMIT, PREVIEW_CHAR_LIMIT, UTF8_BYTE_MULTIPLIER


def charset_fallback_py(data: bytes) -> str | None:
    """Non-UTF-8 fallback arm: charset_normalizer best-guess decode over
    the FULL byte payload — the reference's `from_path(path)` reads the
    whole file, not the byte-capped prefix (content_extract_service.py
    :731-741). Deterministic for fixed bytes; returns None when the
    library is absent or detection fails.
    """
    try:
        from charset_normalizer import from_bytes
    except Exception:  # pragma: no cover - installed in this env
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
    text = str(best)
    return text or None


def extract_text_py(data: bytes | None, char_limit: int = FULL_CHAR_LIMIT) -> str | None:
    """Scalar extraction contract (shared by the UDF and tests):
    decode first char_limit*4 bytes incrementally (incomplete trailing
    sequence dropped), on invalid UTF-8 fall back to charset_normalizer
    over the full payload (content_extract_service.py:725-748), cap at
    char_limit chars, CRLF→LF, strip (:200).
    """
    if data is None:
        return None
    capped = data[: char_limit * UTF8_BYTE_MULTIPLIER] if char_limit > 0 else data
    try:
        text = codecs.getincrementaldecoder("utf-8")().decode(capped, final=False)
    except UnicodeDecodeError:
        text = None
    if not text:
        # The reference's UTF-8 arm returns None on decode error AND on
        # empty decode (e.g. a lone truncated multibyte prefix), and
        # BOTH take the fallback (content_extract_service.py:760-766
        # returns None for text == "", :725-731 falls through on None).
        text = charset_fallback_py(data)
        if not text:
            return None
    if char_limit > 0:
        text = text[:char_limit]
    normalized = text.replace("\r\n", "\n").strip()
    return normalized or None


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """html binary → normalized text (byte-identity contract)."""
    return html.map(extract_text_py)


def extract_text_col(html: Column | str) -> Column:
    c = F.col(html) if isinstance(html, str) else html
    return extract_text_udf(c)


# --- JVM-side presentation helpers (ASCII-safe inputs only) ---------------


def cleanup_snippet_col(text: Column | str) -> Column:
    """Collapse to single-space-joined non-blank stripped lines
    (content_extract_service.py:876-879); NULL when nothing remains.
    JVM approximation: line split on \\r\\n|\\r|\\n, trim = ASCII
    whitespace via regexp. Exact for ASCII inputs.
    """
    c = F.col(text) if isinstance(text, str) else text
    lines = F.split(c, r"\r\n|\r|\n")
    stripped = F.transform(lines, lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""))
    joined = F.array_join(F.filter(stripped, lambda s: F.length(s) > 0), " ")
    return F.when(F.length(joined) > 0, joined)


def trim_preview_col(text: Column | str, limit: int = PREVIEW_CHAR_LIMIT) -> Column:
    """Strip; if longer than `limit`, cut to limit-1, rstrip, append '…'
    (vexor/modes.py:318-322). JVM approximation (ASCII whitespace).
    """
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"^\s+|\s+$", "")
    cut = F.regexp_replace(F.substring(stripped, 1, limit - 1), r"\s+$", "")
    return F.when(F.length(stripped) <= limit, stripped).otherwise(
        F.concat(cut, F.lit("…"))
    )


def page_name_col(url: Column | str) -> Column:
    """Last path segment of a url — the web analog of `file.name`
    (used in `full`/`head` labels, vexor/modes.py:55-58, 110).
    """
    c = F.col(url) if isinstance(url, str) else url
    trimmed = F.regexp_replace(c, r"/+$", "")
    seg = F.element_at(F.split(trimmed, "/"), -1)
    return F.when(F.length(seg) > 0, seg).otherwise(c)
