"""Tokenization as Spark column expressions (JVM fast path) + pandas UDF.

Semantics contract: vexor/bm25.py:33-51. With the optional `tokenizers`
package absent (this environment), the reference tokenizer is exactly
`re.findall(r"[A-Za-z0-9_]+", text.lower())` — pure regex, which we
express JVM-side with `lower` + `regexp_extract_all` so tokenization
stays inside whole-stage codegen (no Python in the hot path at all).

The optional Bert-union path (sub-tokens ∪ whole regex tokens,
vexor/bm25.py:37-51) is provided as an Arrow-vectorized pandas UDF,
gated on `tokenizers` being importable; it exists for parity with
installations that have the package, and is NOT the pinned default.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from vexor_spark.constants import MAX_QUERY_TERMS, TOKEN_PATTERN, TOKEN_PATTERN_LOWER


def tokenize_col(text: Column | str) -> Column:
    """array<string> of BM25 tokens — JVM-side, codegen-friendly.

    Equivalent to the reference's regex-fallback tokenize (bm25.py:36):
    lowercase, then all maximal [a-z0-9_]+ runs in order.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN_LOWER), 0)


def doc_len_col(text: Column | str) -> Column:
    """Token count of a document (bm25_doc_len, index_service.py:1042)."""
    return F.size(tokenize_col(text))


def bert_union_tokenize_py(text: str | None, pre) -> list[str] | None:
    """Scalar Bert-union contract (vexor/bm25.py:37-51): pre-tokenizer
    pieces (stripped, lowercased, alnum-bearing only) extended with the
    whole regex tokens not already among the sub-tokens. `pre` is any
    object with `pre_tokenize_str(text) -> [(token, span), ...]` — the
    real `tokenizers.BertPreTokenizer`, or a stub in tests
    (test_tokenize.py proves this logic identical to the reference's
    own union branch under a shared stub, since neither environment
    has the real package)."""
    import re

    if text is None:
        return None
    tokens = [t for t, _ in pre.pre_tokenize_str(text)]
    normalized: list[str] = []
    for token in tokens:
        cleaned = token.strip()
        if not cleaned:
            continue
        if any(ch.isalnum() for ch in cleaned):
            normalized.append(cleaned.lower())
    sub = set(normalized)
    normalized.extend(
        w for w in re.findall(TOKEN_PATTERN, text.lower()) if w not in sub
    )
    return normalized


@F.pandas_udf(ArrayType(StringType()))
def tokenize_bert_union_udf(texts: pd.Series) -> pd.Series:
    """Bert-pre-tokenizer ∪ whole-token path (vexor/bm25.py:37-51).

    Arrow-vectorized; requires the optional `tokenizers` package and
    raises ImportError per-batch if absent (callers must gate on
    availability — see `has_bert_tokenizer()`).
    """
    from tokenizers.pre_tokenizers import BertPreTokenizer  # noqa: gated import

    pre = BertPreTokenizer()
    return texts.map(lambda t: bert_union_tokenize_py(t, pre))


def has_bert_tokenizer() -> bool:
    try:
        import tokenizers  # noqa: F401

        return True
    except ImportError:
        return False


def prepare_query_terms(query: str) -> list[str]:
    """Driver-side query-term prep: tokenize → order-preserving dedup →
    cap at MAX_QUERY_TERMS (search_service.py:588-590, bm25.py:19).

    Queries are tiny; this runs on the driver like the reference's
    query path, never on executors.
    """
    import re

    tokens = re.findall(TOKEN_PATTERN, query.lower())
    return list(dict.fromkeys(tokens))[:MAX_QUERY_TERMS]
