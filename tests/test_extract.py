"""Extraction byte-identity: engine UDF vs expected `text` column and the
oracle (content_extract_service.py:749-768 + :200 semantics)."""

from __future__ import annotations

from vexor_spark.functions.text import extract_text_col, extract_text_py
from vexor_spark.oracle import pyref
from vexor_spark.sources.corpus import generate_pages_df, generate_pages_local


def test_scalar_extract_edge_cases():
    assert extract_text_py(b"") is None
    assert extract_text_py(b"   \r\n \t ") is None
    # Invalid UTF-8 now takes the charset_normalizer fallback arm
    # (content_extract_service.py:725-748): deterministic best-guess
    # decode of the FULL payload, whatever the library guesses.
    from vexor_spark.functions.text import charset_fallback_py

    fb = charset_fallback_py(b"\xff\xfe bad")
    assert fb is not None
    assert extract_text_py(b"\xff\xfe bad") == fb.replace("\r\n", "\n").strip()
    # latin-1-style bytes resolve to SOME deterministic non-None text
    assert extract_text_py("café münchen".encode("latin-1")) is not None
    assert extract_text_py("héllo\r\nwörld".encode()) == "héllo\nwörld"
    # trailing incomplete multibyte sequence is dropped, not an error
    data = "héllo".encode() + "é".encode()[:1]
    assert extract_text_py(data) == "héllo"
    # char cap applies before normalization
    body = ("x" * 10) + "\r\n tail"
    assert extract_text_py(body.encode(), char_limit=11) == "x" * 10
    assert extract_text_py(b"abc", char_limit=0) == "abc"


def test_extract_matches_oracle_module():
    for rec in generate_pages_local(40, edges=True):
        assert extract_text_py(rec["html"]) == pyref.extract_text(rec["html"])


def test_engine_extraction_byte_identical_on_corpus(spark):
    pages = generate_pages_df(spark, 60, edges=True, partitions=4)
    got = (
        pages.withColumn("engine_text", extract_text_col("html"))
        .select("url", "text", "engine_text")
        .collect()
    )
    assert len(got) == 60
    for row in got:
        assert row["engine_text"] == row["text"], row["url"]
