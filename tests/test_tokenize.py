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
