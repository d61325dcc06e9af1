"""Vectorized cross-engine polynomial hash (Arrow-batched numpy).

`textstats.poly_hash_col` evaluates the shared (a·31 + code) % M fold
as a higher-order Column function: split("") → transform(ascii) →
aggregate.  HOF lambda expressions are CodegenFallback — every
character of every token costs an interpreted expression-tree eval, and
the dedup family (MinHash shingles, SimHash sketches, whole-text
fingerprints) runs it over EVERY character of the corpus.  These
pandas UDFs compute the identical fold as a few numpy passes per Arrow
batch (guide: do the heavy lifting in vectorized native code inside
the UDF), so the JVM↔Python crossing carries only the column being
hashed and the hash math runs at C speed.

Bit-identity contract (pinned by tests/test_fasthash.py):
- Spark's split(s, '') yields CODEPOINTS (one element per Unicode
  character, verified incl. astral plane), and ascii(c) is the
  codepoint value — identical to Python's per-character ord().
- The empty string folds to 0 on the Column path (split('') = ['']
  and ascii('') = 0 ⇒ (0·31+0)%M = 0); the numpy path's empty loop
  also returns 0.
- All math is exact in uint64: h < 2^31, 31·h + code < 2^36 (Horner)
  and code·31^j % M < 2^31 summed over ≤2^20 terms < 2^51 (power-sum).

Two regimes, same polynomial Σ code_i · 31^(L−1−i) mod M:
- many short strings (token arrays): Horner ACROSS strings — one
  vectorized step per character position, ~max-token-length passes.
- few long strings (whole-document fingerprints): per-string
  power-weighted sum — ~3 numpy passes over the string's codepoints
  (a 200k-char document would need 200k across-string Horner steps).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

HASH_MOD = 2147483647  # 2^31 − 1, matches textstats.HASH_MOD

_M64 = np.uint64(HASH_MOD)
_31 = np.uint64(31)

# powers of 31 mod M, extended on demand (module-level: computed once
# per Python worker, reused across batches/tasks via worker reuse).
_POW31 = np.array([1], dtype=np.uint64)


def _pow31(n: int) -> np.ndarray:
    """First n powers of 31 mod M (31^0 .. 31^{n-1})."""
    global _POW31
    if len(_POW31) < n:
        grow = np.empty(n, dtype=np.uint64)
        grow[: len(_POW31)] = _POW31
        for i in range(len(_POW31), n):
            grow[i] = (grow[i - 1] * _31) % _M64
        _POW31 = grow
    return _POW31[:n]


def hash_many_short(strs: list) -> np.ndarray:
    """int64 poly hashes of many (typically short) strings.

    Token streams are Zipf-distributed — the same handful of vocabulary
    strings repeats millions of times — so the batch is first factorized
    (one C-speed hash-table pass) and the Horner fold runs over the
    UNIQUE strings only; per-occurrence hashes are a single gather.
    Identical values to hashing each occurrence directly (same
    per-string fold, memoized)."""
    codes, uh = hash_tokens_factorized(strs)
    if len(uh) == len(codes):
        return uh  # all unique — uh is already in occurrence order
    return uh[codes]


def hash_tokens_factorized(strs: list) -> tuple[np.ndarray, np.ndarray]:
    """(codes, unique_hashes): factorize the token stream and hash the
    unique strings only. occurrence hash i == unique_hashes[codes[i]].
    Kernels that aggregate per-token functions (SimHash bit counts) can
    work per UNIQUE value and weight by occurrence counts."""
    n = len(strs)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    codes, uniques = pd.factorize(
        strs if isinstance(strs, np.ndarray) else np.asarray(strs, dtype=object),
        use_na_sentinel=False,
    )
    return codes, _hash_many_short_raw(list(uniques))


def _hash_many_short_raw(strs: list) -> np.ndarray:
    """Horner across strings, one vectorized step per character
    position (the pre-memoization kernel; bit-identity reference)."""
    n = len(strs)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out.astype(np.int64)
    lens = np.fromiter(map(len, strs), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    if maxlen == 0:
        return out.astype(np.int64)
    codes = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    active = np.arange(n)[lens > 0]
    # keep only strings still having a j-th character each round; sort
    # once by length so the active set is a shrinking prefix view.
    order = active[np.argsort(lens[active], kind="stable")][::-1]
    slens = lens[order]
    sstarts = starts[order]
    acc = np.zeros(len(order), dtype=np.uint64)
    for j in range(maxlen):
        m = int(np.searchsorted(-slens, -(j + 1), side="right"))
        if m == 0:
            break
        idx = sstarts[:m] + j
        acc[:m] = (acc[:m] * _31 + codes[idx].astype(np.uint64)) % _M64
    out[order] = acc
    return out.astype(np.int64)


def hash_one_long(s: str) -> int:
    """Poly hash of one (typically long) string via the power-weighted
    sum — identical value to the Horner fold."""
    if not s:
        return 0
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    L = len(codes)
    p = _pow31(L)[::-1]
    # (code · 31^j mod M) < 2^31 each; guard very long strings by
    # chunked summation so the uint64 running sum cannot overflow
    # (2^31 · chunk ≤ 2^31 · 2^20 = 2^51).
    terms = (codes * p) % _M64
    if L <= (1 << 20):
        return int(terms.sum() % _M64)
    total = np.uint64(0)
    for i in range(0, L, 1 << 20):
        total = (total + terms[i : i + (1 << 20)].sum() % _M64) % _M64
    return int(total)


@F.pandas_udf(ArrayType(LongType()))
def poly_hash_tokens_udf(tokens: pd.Series) -> pd.Series:
    """array<string> → array<long>: per-token poly hashes (the `_th`
    projection of the dedup family), vectorized per Arrow batch."""
    flat: list = []
    counts = np.zeros(len(tokens), dtype=np.int64)
    for i, arr in enumerate(tokens):
        if arr is None:
            continue
        counts[i] = len(arr)
        flat.extend(arr)
    hashes = hash_many_short(flat)
    out: list = []
    pos = 0
    for i, arr in enumerate(tokens):
        if arr is None:
            out.append(None)
            continue
        c = int(counts[i])
        out.append(hashes[pos : pos + c])
        pos += c
    return pd.Series(out)


@F.pandas_udf(LongType())
def poly_hash_text_udf(text: pd.Series) -> pd.Series:
    """string → long: whole-string poly hash (document fingerprints).
    Long-string regime: ~3 numpy passes per string, no per-character
    Python."""
    return pd.Series(
        [None if s is None else hash_one_long(s) for s in text],
        dtype="object",
    )
