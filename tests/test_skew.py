"""Head-term skew: a term occurring in EVERY document (the Zipfian
worst case for posting assembly) must build correctly through the
salted path and stream through the sorted block writer, and score
exactly."""

from __future__ import annotations

import pytest

from vexor_spark.index.build import build_index
from vexor_spark.index.storage import PersistedIndex, build_and_write_index
from vexor_spark.oracle import pyref
from vexor_spark.sources.corpus import PAGES_SCHEMA, page_record


def _skewed_records(n: int = 400):
    recs = []
    for i in range(n):
        r = page_record(i, edges=False)
        # every page contains the hot term; tf varies
        r["html"] = (r["text"] + " hotterm" * (1 + i % 3)).encode()
        r["text"] = None  # recomputed by engine; oracle uses html
        recs.append(r)
    return recs


def test_hot_term_salted_and_streamed(spark, tmp_path):
    recs = _skewed_records()
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], None, r["lang"]) for r in recs],
        PAGES_SCHEMA,
    )
    oracle = pyref.build_corpus_index([(r["url"], r["html"]) for r in recs])
    hot_df = len(oracle["postings"]["hotterm"])
    assert hot_df >= 400  # present in every page (possibly multiple chunks)

    # salted array path
    index = build_index(pages, salt_partitions=8, term_buckets=8)
    got = {
        r["term"]: [(p["doc_id"], p["tf"], p["doc_len"]) for p in r["postings"]]
        for r in index.postings.filter("term = 'hotterm'").collect()
    }
    assert got["hotterm"] == sorted(oracle["postings"]["hotterm"])
    index.docs.unpersist(); index.postings.unpersist()

    # streamed sorted-writer path (no arrays) + query
    build_and_write_index(pages, tmp_path / "idx", term_buckets=8)
    pidx = PersistedIndex(spark, tmp_path / "idx")
    want = pyref.search(oracle, "hotterm", k=10)
    got_q = pidx.search_local("hotterm", k=10)
    assert [(d,) for _, d, _ in got_q] == [(d,) for d, _ in want]
    for (_, gd, gs), (wd, ws) in zip(got_q, want):
        assert gs == pytest.approx(ws, rel=1e-9)
    # block metadata spans the whole hot list
    blocks = (
        pidx.postings.filter("term = 'hotterm'")
        .select("block_id", "n", "df")
        .collect()
    )
    assert sum(b["n"] for b in blocks) == hot_df
    assert all(b["df"] == hot_df for b in blocks)
    assert len(blocks) == (hot_df + 127) // 128


def test_lsh_hot_bucket_cap_output_identical(spark):
    """A planted boilerplate bucket (300 identical docs -> every band
    key collides) must produce the exact same candidate pairs with the
    chunked max_bucket routing as with the plain self-join, while no
    join task carries the full m x m bucket."""
    from pyspark.sql import functions as F

    from vexor_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_pairs,
    )

    hot = [(i, ["the", "same", "boilerplate", "page", "text"] * 3) for i in range(300)]
    cold = [
        (1000 + i, [f"unique{i}w{j}" for j in range(12)]) for i in range(50)
    ]
    docs = spark.createDataFrame(hot + cold, "doc_id long, tokens array<string>")
    sigs = minhash_signatures(docs, "tokens")

    capped = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sigs, max_bucket=16).collect()
    }
    plain = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sigs, max_bucket=None).collect()
    }
    assert capped == plain
    # the hot bucket contributes all C(300,2) pairs
    assert sum(1 for a, b in capped if a < 300 and b < 300) == 300 * 299 // 2

    # end-to-end: verified near-dup pairs identical under the cap
    nd_capped = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in near_dup_pairs(docs, max_bucket=16).collect()
    }
    nd_plain = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in near_dup_pairs(docs, max_bucket=None).collect()
    }
    assert nd_capped == nd_plain
    assert len(nd_capped) >= 300 * 299 // 2


def test_simhash_hot_block_cap_output_identical(spark):
    """Boilerplate docs share one simhash -> one hot block bucket; the
    chunked cap must leave the (hamming, jaccard)-verified pair set
    unchanged, and the blocked result must equal brute force (the
    pigeonhole losslessness claim) on a mixed corpus."""
    from pyspark.sql import functions as F

    from vexor_spark.operators.dedup import (
        shingle_hashes_from,
        simhash_from_hashes,
        simhash_near_dup_pairs,
    )
    from vexor_spark.operators.textstats import poly_hash_col

    hot = [(i, ["common", "header", "footer", "nav", "text"] * 4) for i in range(200)]
    cold = [(1000 + i, [f"w{i}x{j}" for j in range(15)]) for i in range(60)]
    docs = spark.createDataFrame(hot + cold, "doc_id long, tokens array<string>")

    def pairs(max_bucket):
        return {
            (r["doc_a"], r["doc_b"], r["hamming"], round(r["jaccard"], 9))
            for r in simhash_near_dup_pairs(
                docs, max_bucket=max_bucket
            ).collect()
        }

    capped = pairs(16)
    assert capped == pairs(None)
    # all C(200,2) identical-doc pairs survive with hamming 0, jaccard 1
    hot_pairs = {(a, b) for a, b, h, j in capped if a < 200 and b < 200}
    assert len(hot_pairs) == 200 * 199 // 2
    assert all(h == 0 and j == 1.0 for a, b, h, j in capped if a < 200 and b < 200)

    # brute-force cross-check of blocking losslessness on the full set
    per_doc = docs.withColumn(
        "_th", F.transform("tokens", lambda t: poly_hash_col(t))
    ).select(
        "doc_id",
        simhash_from_hashes(F.col("_th")).alias("sim"),
        F.array_distinct(shingle_hashes_from(F.col("_th"))).alias("sh"),
    )
    per = {r["doc_id"]: (r["sim"], set(r["sh"])) for r in per_doc.collect()}
    brute = set()
    ids = sorted(per)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, ha = per[a]
            sb, hb = per[b]
            ham = bin(sa ^ sb).count("1")
            if ham > 2:
                continue
            inter = len(ha & hb)
            jac = inter / (len(ha) + len(hb) - inter) if (ha or hb) else 0.0
            if jac >= 0.8:
                brute.add((a, b, ham, round(jac, 9)))
    assert {(a, b, h, j) for a, b, h, j in capped} == brute
