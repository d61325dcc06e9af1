"""Bit-identity pin for the vectorized poly-hash kernel
(functions/fasthash.py): the Arrow UDFs must produce EXACTLY the same
int64 values as the interpreted Column fold (textstats.poly_hash_col)
— the dedup family's DuckDB oracles compose from that fold, so a
single differing hash would silently break cross-engine parity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from vexor_spark.functions.fasthash import (
    hash_many_short,
    hash_one_long,
    poly_hash_text_udf,
    poly_hash_tokens_udf,
)
from vexor_spark.operators.textstats import HASH_MOD, poly_hash_col

NASTY = [
    "",
    "a",
    "abc",
    "中文搜索",
    "中a文",
    "héllo wörld",
    "\U0001F389x",  # astral-plane codepoint
    "mixed中\U0001F389tail",
    " \t\r\n ",
    "x" * 3000,  # long string (power-sum regime)
    "…—–",
]


def _ref(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % HASH_MOD
    return h


def test_numpy_kernels_match_python_fold():
    rng = random.Random(7)
    alpha = "abcXYZ09_ 中文搜索,.!?…\U0001F389\t"
    rs = NASTY + [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60)))
        for _ in range(2000)
    ]
    want = [_ref(s) for s in rs]
    assert list(hash_many_short(rs)) == want
    assert [hash_one_long(s) for s in rs] == want


def test_udfs_match_column_fold(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(NASTY)], "i long, s string")
    rows = df.select(
        "i",
        poly_hash_col(F.col("s")).alias("col_fold"),
        poly_hash_text_udf(F.col("s")).alias("udf_text"),
    ).collect()
    for r in rows:
        assert r["udf_text"] == r["col_fold"], NASTY[r["i"]]

    toks = df.select("i", F.split("s", " ").alias("tokens"))
    rows = toks.select(
        "i",
        F.transform("tokens", lambda t: poly_hash_col(t)).alias("col_fold"),
        poly_hash_tokens_udf("tokens").alias("udf_tokens"),
    ).collect()
    for r in rows:
        assert list(r["udf_tokens"]) == list(r["col_fold"]), NASTY[r["i"]]


def test_udf_null_handling(spark):
    df = spark.createDataFrame(
        [(0, None, None), (1, "ab", ["ab", ""])],
        "i long, s string, tokens array<string>",
    )
    rows = df.select(
        "i",
        poly_hash_text_udf("s").alias("h"),
        poly_hash_tokens_udf("tokens").alias("th"),
    ).orderBy("i").collect()
    assert rows[0]["h"] is None and rows[0]["th"] is None
    assert rows[1]["h"] == _ref("ab")
    assert list(rows[1]["th"]) == [_ref("ab"), 0]


def test_factorized_memoization_identity():
    """Round-7 memoization: the factorize-and-gather path must equal
    the raw Horner fold occurrence-for-occurrence — dup-heavy,
    all-unique, empties, CJK, astral plane."""
    from vexor_spark.functions.fasthash import (
        _hash_many_short_raw,
        hash_many_short,
        hash_tokens_factorized,
    )

    dup_heavy = (["spark", "", "merge", "漢字", "𐍈x", "a" * 300] * 500) + [
        f"u{i}" for i in range(100)
    ]
    all_unique = [f"tok{i}" for i in range(1000)]
    for strs in (dup_heavy, all_unique, [], [""], ["x"]):
        raw = _hash_many_short_raw(list(strs))
        memo = hash_many_short(list(strs))
        assert memo.tolist() == raw.tolist()
        codes, uh = hash_tokens_factorized(list(strs))
        assert (uh[codes] if len(strs) else uh).tolist() == raw.tolist()
