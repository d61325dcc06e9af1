"""Tokenizer parity: JVM regexp path vs pure-Python oracle (bm25.py:36)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vexor_spark.functions.tokenize import prepare_query_terms, tokenize_col
from vexor_spark.oracle import pyref

CASES = [
    "Hello World",
    "snake_case_identifier CamelCaseToken mixed_Case_99",
    "punct!!! only??? ;;;",
    "!!!",
    "",
    "  leading and trailing  ",
    "digits 123 456_789 mix99ed",
    "CRLF\r\nlines\nhere",
    "中文没有ascii",
    "中文 mixed ascii_term 混合",
    "Ünïcode Ñoise Straße",
    "a_b__c___d",
    "tab\tsep\tvals",
]


def test_tokenize_matches_oracle(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id int, text string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", tokenize_col("text").alias("toks")).collect()
    }
    for i, text in enumerate(CASES):
        assert got[i] == pyref.tokenize(text), f"case {i!r}: {text!r}"


def test_tokenize_empty_and_punct():
    assert pyref.tokenize("!!!") == []
    assert pyref.tokenize("") == []


def test_prepare_query_terms_dedup_and_cap():
    assert prepare_query_terms("b a b c a") == ["b", "a", "c"]
    many = " ".join(f"t{i}" for i in range(40))
    terms = prepare_query_terms(many)
    assert len(terms) == 32
    assert terms == [f"t{i}" for i in range(32)]
    assert prepare_query_terms("搜索") == []


def test_doc_len_matches_token_count(spark):
    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    rows = df.select(
        "text", F.size(tokenize_col("text")).alias("n")
    ).collect()
    for r in rows:
        assert r["n"] == len(pyref.tokenize(r["text"]))


def test_bert_union_logic_matches_reference_under_stub():
    """The Bert-union branch is unverifiable with the real `tokenizers`
    package absent — but the UNION LOGIC itself is provable: inject the
    same stub pre-tokenizer into the reference's own vexor.bm25 and
    into our scalar contract, and the outputs must agree exactly
    (including the sub-token/whole-token set difference, U3)."""
    import re
    import sys
    import types
    from pathlib import Path

    import pytest

    if not Path("/root/reference/vexor/bm25.py").exists():  # pragma: no cover
        pytest.skip("reference checkout not present")
    sys.path.insert(0, "/root/reference")

    from vexor_spark.functions.tokenize import bert_union_tokenize_py

    class StubBertPreTokenizer:
        # Bert-like: alnum runs, punctuation (incl. '_') isolated.
        _re = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]", re.UNICODE)

        def pre_tokenize_str(self, text):
            return [(m.group(0), (m.start(), m.end())) for m in self._re.finditer(text)]

    stub_pre = types.ModuleType("tokenizers.pre_tokenizers")
    stub_pre.BertPreTokenizer = StubBertPreTokenizer
    stub_root = types.ModuleType("tokenizers")
    stub_root.pre_tokenizers = stub_pre

    import vexor.bm25 as ref_bm25

    saved = {k: sys.modules.get(k) for k in ("tokenizers", "tokenizers.pre_tokenizers")}
    sys.modules["tokenizers"] = stub_root
    sys.modules["tokenizers.pre_tokenizers"] = stub_pre
    ref_bm25._get_bm25_tokenizer.cache_clear()
    try:
        texts = [
            "Hello World",
            "snake_case_identifier CamelCaseToken mixed_Case_99",
            "!!! ??? ;;;",
            "",
            "中文 mixed ascii_term 混合",
            "digits 123 456_789",
            "CRLF\r\nlines\nhere tab\tsep",
            "Ünïcode Straße",
            "a_b c-d e.f",
        ]
        for t in texts:
            assert bert_union_tokenize_py(t, StubBertPreTokenizer()) == ref_bm25.tokenize(t), t
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        ref_bm25._get_bm25_tokenizer.cache_clear()
        # the fallback path must be back for the other parity tests
        assert ref_bm25._get_bm25_tokenizer() is None
