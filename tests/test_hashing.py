"""Python XXH64 must match Spark's xxhash64 exactly (the local query
path depends on it for partition pruning)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vexor_spark.functions.hashing import spark_pmod_bucket, spark_xxhash64_str

EDGE_CASES = [
    "", "a", "ab", "abc", "abcd", "abcde", "spark", "uid_000042",
    "a" * 7, "b" * 8, "c" * 9, "d" * 15, "e" * 16, "f" * 31, "g" * 32,
    "h" * 33, "i" * 100, "中文字符串", "héllo wörld", "snake_case_identifier",
]


def test_matches_spark_on_edges(spark):
    df = spark.createDataFrame([(c,) for c in EDGE_CASES], "s string")
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(64)).alias("b"),
    ).collect()
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], repr(r["s"])
        assert spark_pmod_bucket(r["s"], 64) == r["b"], repr(r["s"])


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=20, unique=True))
def test_matches_spark_random(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], repr(r["s"])
