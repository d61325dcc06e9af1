"""Indexing-mode semantics (SURVEY §2.8): hand-computed expectations per
mode + Spark-plumbing equality with the scalar chunker."""

from __future__ import annotations

from vexor_spark.operators.chunking import chunk_page_py, chunk_pages

URL = "https://example.org/data/hello_page.html"


def test_name_mode():
    (p,) = chunk_page_py(URL, b"whatever body", mode="name")
    assert p["label"] == "hello page.html"
    assert p["preview"] == "hello_page.html"


def test_head_mode_label_and_cleanup():
    body = "  Title line \r\n\r\n  second   line \nthird\n".encode()
    (p,) = chunk_page_py(URL, body, mode="head")
    # cleanup_snippet: strip each line, drop blanks, join with one space
    assert p["label"] == "hello_page.html :: Title line second   line third"
    assert p["preview"] == "Title line second   line third"
    assert p["chunk_index"] == 0


def test_head_mode_cap_and_fallback():
    (p,) = chunk_page_py(URL, b"", mode="head")
    assert p["label"] == "hello page.html"  # name fallback
    long = ("x" * 5000).encode()
    (p,) = chunk_page_py(URL, long, mode="head")
    assert p["label"] == "hello_page.html :: " + "x" * 1000  # 1000-char cap
    assert p["preview"].endswith("…") and len(p["preview"]) == 160


def test_brief_mode_keywords():
    body = (
        "the spark engine spark engine spark index index keyword "
        "and for are data user 中文关键词 中文关键词 的 ok"
    ).encode()
    (p,) = chunk_page_py(URL, body, mode="brief")
    # spark(3) > engine(2) = index(2) = 中文关键词(2) > keyword(1)...;
    # ties keep first-seen order; stopwords (the/and/for/are/data/user/的)
    # and len<3 words dropped
    kws = p["label"].split(" :: ")[1].split(" ")
    assert kws[0] == "spark"
    assert kws[1:4] == ["engine", "index", "中文关键词"]
    assert "the" not in kws and "data" not in kws and "ok" not in kws
    assert p["preview"].startswith("spark, engine, index")


def test_auto_mode_routes_by_size():
    small = b"tiny page body"
    (p,) = chunk_page_py(URL, small, mode="auto")
    assert "[#1] ::" in p["label"]  # routed to full
    big = ("word " * 3000).encode()  # > 10_000 bytes
    (p,) = chunk_page_py(URL, big, mode="auto")
    assert p["label"].startswith("hello_page.html :: ")  # routed to head
    assert "[#" not in p["label"]


def test_spark_plumbing_matches_scalar(spark):
    from vexor_spark.sources.corpus import generate_pages_df, generate_pages_local

    pages = generate_pages_df(spark, 25, edges=True, partitions=3)
    local = generate_pages_local(25, edges=True)
    for mode in ("name", "head", "brief", "auto", "full"):
        got = {
            (r["url"], r["chunk_index"]): (r["label"], r["preview"])
            for r in chunk_pages(pages, mode=mode).collect()
        }
        want = {}
        for rec in local:
            for p in chunk_page_py(rec["url"], rec["html"], mode=mode):
                want[(rec["url"], p["chunk_index"])] = (p["label"], p["preview"])
        assert got == want, mode
