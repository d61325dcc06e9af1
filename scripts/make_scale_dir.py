"""Generate a scaled-up analog of the driver's sf-dir tables
(documents / embeddings / events) for scale probing — same schemas and
marginal distributions as /root/testdata/sf0.1 (31-word vocab, doc
length U[10,100], 5 langs at the observed mix, 5 event types over a
30-day window, 64-dim float embeddings with 10 labels), deterministic
from --seed, sized --factor × the sf0.1 row counts. Pure
numpy→pyarrow; no Spark needed.

Usage: python scripts/make_scale_dir.py --out /tmp/sf1x --factor 10
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "batch", "part", "line", "order", "small", "sort", "fast",
    "scan", "a", "hash", "slow", "group", "query", "big", "filter",
    "key", "row", "data", "agg", "join", "customer", "index", "range",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
ETYPES = ["signup", "click", "purchase", "error", "view"]

SF01_DOCS = 5_000
SF01_EMB = 2_000
SF01_EVENTS = 100_000
SF01_USERS = 1_500
EMB_DIM = 64


def write_documents(out: Path, n: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    lens = rng.integers(10, 101, size=n)
    total = int(lens.sum())
    words = rng.integers(0, len(VOCAB), size=total)
    vocab = np.array(VOCAB)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    texts = [
        " ".join(vocab[words[s : s + l]]) for s, l in zip(starts, lens)
    ]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], np.int64)),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")


def write_embeddings(out: Path, n: int, seed: int) -> None:
    rng = np.random.default_rng(seed + 1)
    vecs = (rng.standard_normal((n, EMB_DIM)) * 0.15).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }
    )
    pq.write_table(tbl, out / "embeddings.parquet")


def write_events(out: Path, n: int, n_users: int, seed: int) -> None:
    rng = np.random.default_rng(seed + 2)
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base + np.sort(rng.integers(0, span_us, size=n)).astype("timedelta64[us]")
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, n_users, size=n).astype(np.int64)),
            "event_type": pa.array(rng.choice(ETYPES, size=n).tolist()),
            "value": pa.array(np.round(rng.uniform(0, 560, size=n), 2)),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]
            ),
        }
    )
    pq.write_table(tbl, out / "events.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=20260816)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    write_documents(out, SF01_DOCS * args.factor, args.seed)
    write_embeddings(out, SF01_EMB * args.factor, args.seed)
    write_events(out, SF01_EVENTS * args.factor, SF01_USERS * args.factor, args.seed)
    print(f"wrote {out} at factor {args.factor}")


if __name__ == "__main__":
    main()
