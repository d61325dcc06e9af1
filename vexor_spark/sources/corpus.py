"""Deterministic synthetic web-pages corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

- `html` is the raw page bytes; `text` is the *expected* extraction
  (the byte-identity contract the engine's extract UDF must reproduce).
- Every row is a pure function of (row index, seed) — generation is
  distributed via mapInPandas over spark.range and independent of
  partitioning, so any scale can be produced on any cluster layout.
- Edge rows (fixed low indices when `edges=True`): empty body,
  whitespace-only, punctuation-only, single-term-repeated (tf>1),
  duplicate bodies under different urls (tie-break exercise), CRLF +
  blank-padded body, CJK body, an invalid-UTF-8 body, and one body
  longer than the 200k char cap.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vexor_spark.functions.text import extract_text_py

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), False),
    ]
)

_TOPICS = ("search", "spark", "news", "code", "data", "wiki")

_WORDS = (
    "the quick brown fox jumps over lazy dog search engine index posting "
    "term frequency document ranking score query token shard partition "
    "merge compress varint delta block max prune crawl fetch parse html "
    "link graph rank fusion dense sparse vector lexical match retrieval "
    "cluster executor shuffle stage task memory spill disk network "
    "snake_case_identifier CamelCaseToken mixed_Case_99 http2 utf8 "
    "alpha beta gamma delta epsilon zeta theta lambda sigma omega"
).split()

_CJK_SNIPPETS = ("搜索引擎索引", "分布式系统设计", "倒排索引压缩")

_EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)

# Fixed edge-case bodies by row index (active when edges=True).
_EDGE_BODIES: dict[int, bytes] = {
    3: b"",  # empty -> extraction None -> name fallback
    4: b"   \r\n  \t \n   ",  # whitespace-only -> fallback
    5: "!!! ??? ;;; ***".encode(),  # punctuation-only: tokenize -> []
    6: ("repeated " * 24).encode(),  # single term, tf > 1
    7: b"Shared duplicate body for tie-break checks.",
    8: b"Shared duplicate body for tie-break checks.",  # dup of 7
    9: "\r\n\r\n  Title with CRLF\r\nsecond line\r\n\r\n".encode(),
    10: ("中文网页 " + " ".join(_CJK_SNIPPETS) + " mixed ascii_term").encode(),
    11: b"\xff\xfe invalid utf8 \xff",  # decode error -> None -> fallback
}
_LONG_BODY_INDEX = 12  # body longer than FULL_CHAR_LIMIT


def page_record(i: int, seed: int = 42, edges: bool = True) -> dict:
    rng = random.Random(seed * 1_000_003 + i)
    topic = _TOPICS[i % len(_TOPICS)]
    url = f"https://example.org/{topic}/{i:06d}.html"
    ts = _EPOCH + dt.timedelta(seconds=i)
    lang = "zh" if (edges and i == 10) else ("en" if i % 17 != 0 else "de")

    if edges and i in _EDGE_BODIES:
        html = _EDGE_BODIES[i]
    elif edges and i == _LONG_BODY_INDEX:
        filler = " ".join(rng.choices(_WORDS, k=40_000))
        html = (f"LongPage uid_{i:06d}\n" + filler).encode()
    else:
        n_sentences = rng.randint(2, 20)
        lines = [f"Page uid_{i:06d} about {topic}"]
        for _ in range(n_sentences):
            words = rng.choices(_WORDS, k=rng.randint(3, 12))
            if rng.random() < 0.05:
                words.append(rng.choice(_CJK_SNIPPETS))
            if rng.random() < 0.1:
                words.append(str(rng.randint(0, 9999)))
            lines.append(" ".join(words) + rng.choice([".", "!", "?", ""]))
        sep = "\r\n" if rng.random() < 0.2 else "\n"
        body = sep.join(lines)
        if rng.random() < 0.15:
            body = "\n  \n" + body + "\n\n "
        html = body.encode()

    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": extract_text_py(html),
        "lang": lang,
    }


def generate_pages_local(n: int, seed: int = 42, edges: bool = True) -> list[dict]:
    return [page_record(i, seed, edges) for i in range(n)]


def generate_pages_df(
    spark: SparkSession,
    n: int,
    *,
    seed: int = 42,
    edges: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    ids = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            records = [page_record(int(i), seed, edges) for i in batch["id"]]
            yield pd.DataFrame.from_records(records)

    return ids.mapInPandas(gen, PAGES_SCHEMA)


def query_suite(n_pages: int, seed: int = 42) -> list[dict]:
    """30 (query, expected_url) pairs shaped like the reference's
    scripts/eval_queries.jsonl: 10 exact unique identifiers, ~14
    natural-language phrases drawn from one page's vocabulary, plus
    edge queries (dup terms, >32 terms, CJK-only, zero-match).
    """
    rng = random.Random(seed + 777)
    normal_ids = [i for i in range(n_pages) if i not in _EDGE_BODIES and i != _LONG_BODY_INDEX]
    queries: list[dict] = []
    # 10 exact unique identifiers
    for i in rng.sample(normal_ids, min(10, len(normal_ids))):
        rec = page_record(i, seed)
        queries.append({"query": f"uid_{i:06d}", "expected": rec["url"]})
    # 14 phrase queries from a page's own text
    for i in rng.sample(normal_ids, min(14, len(normal_ids))):
        rec = page_record(i, seed)
        words = [w for w in rec["text"].split() if w.isalnum()]
        k = min(len(words), rng.randint(3, 6))
        phrase = " ".join(rng.sample(words, k)) if words else f"uid_{i:06d}"
        queries.append({"query": phrase + f" uid_{i:06d}", "expected": rec["url"]})
    # edge queries
    dup_id = rng.choice(normal_ids)
    rec = page_record(dup_id, seed)
    queries.append(
        {"query": f"uid_{dup_id:06d} uid_{dup_id:06d} uid_{dup_id:06d}", "expected": rec["url"]}
    )
    many = " ".join(f"filler{j}" for j in range(40)) + f" uid_{dup_id:06d}"
    queries.append({"query": many, "expected": None})  # >32 terms: unique id capped away
    queries.append({"query": "搜索引擎", "expected": None})  # CJK-only: tokenizes to []
    queries.append({"query": "zzqqxx notfoundterm", "expected": None})
    while len(queries) < 30:
        i = rng.choice(normal_ids)
        rec = page_record(i, seed)
        queries.append({"query": f"Page uid_{i:06d}", "expected": rec["url"]})
    return queries[:30]


# Prunable HEAD-TERM queries (round-5 verdict item 3): every word is
# drawn from the shared _WORDS vocabulary, so each appears in roughly
# 2/3 of all pages (df ≈ 0.67·N ≫ k) — the query class real web
# traffic is made of and the one block-max pruning exists for. The
# uid-anchored suite above never engages pruning (every query carries
# a df=1 term whose θ is the only positive one — measured 0/30 at 2M,
# BENCH_R04_SCALE); these engage it by construction. `expected` is
# None: they match thousands of pages, so they test latency/pruning,
# not single-answer ranking.
# Mix of shapes exercising every wand.py engagement rule: dominated
# pairs (rare topic anchor 'news'/'wiki'/'spark' + long common list —
# the WAND win shape, real block skipping); singles (θ pass would
# decode the whole list → θ-cost skip); balanced pairs/triples (no
# block can fail the bound → bound skip). The suite carries all three
# so benches show engagement AND that the skips are free.
_HEAD_QUERIES = (
    "news merge",
    "wiki index",
    "spark ranking",
    "merge hash",
    "index",
    "merge",
    "posting compress",
    "index posting term",
    "shuffle stage task memory",
    "link graph rank fusion",
)


def head_term_queries() -> list[dict]:
    return [{"query": q, "expected": None, "cls": "head"} for q in _HEAD_QUERIES]


def query_suite_extended(n_pages: int, seed: int = 42) -> list[dict]:
    """The committed serving suite: the 30 uid/phrase/edge queries plus
    the 10 head-term queries, each tagged with its class (`cls` ∈
    uid | phrase | edge | head) so benches can report per-class
    latency and pruning engagement."""
    base = query_suite(n_pages, seed)
    for q in base:
        if q.get("expected") is None:
            q["cls"] = "edge"
        elif q["query"].startswith(("uid_", "Page uid_")):
            q["cls"] = "uid"
        else:
            q["cls"] = "phrase"
    return base + head_term_queries()
