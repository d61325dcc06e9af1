"""Engine constants, pinned to the reference's published values.

Reference: /root/reference/vexor/bm25.py:13-21 (BM25 constants, token
regex), vexor/services/content_extract_service.py:13-17 (char caps and
chunk geometry), vexor/modes.py:24 (preview limit),
vexor/services/search_service.py:75 (legacy fusion weight).
"""

# --- BM25 / fusion (vexor/bm25.py:13-19) ---
BM25_K1 = 1.5
BM25_B = 0.75
RRF_K = 60
RRF_DENSE_WEIGHT = 0.7
RRF_BM25_WEIGHT = 0.3
MAX_QUERY_TERMS = 32

# Token regex — the pinned tokenizer path. The reference unions
# BertPreTokenizer sub-tokens with these whole tokens when the optional
# `tokenizers` package is importable, and falls back to the bare regex
# otherwise (vexor/bm25.py:33-51). This sandbox has no `tokenizers`, so
# the regex fallback is the canonical path; the Bert-union path is kept
# behind a flag in functions/tokenize.py.
TOKEN_PATTERN = r"[A-Za-z0-9_]+"
# Lowercased input never contains A-Z, so this is the same language and
# is what we hand to JVM-side regexp_extract_all.
TOKEN_PATTERN_LOWER = r"[a-z0-9_]+"

# --- Extraction / chunking (content_extract_service.py:13-17) ---
HEAD_CHAR_LIMIT = 1000
FULL_CHAR_LIMIT = 200_000
DEFAULT_CHUNK_SIZE = 1000
DEFAULT_CHUNK_OVERLAP = 100
UTF8_BYTE_MULTIPLIER = 4

# --- Presentation (vexor/modes.py:24) ---
PREVIEW_CHAR_LIMIT = 160

# --- Legacy weighted-sum rerank (search_service.py:75) ---
FUSION_SEMANTIC_WEIGHT = 0.7

# --- Rerank candidate clamp (search_service.py:171-174) ---
RERANK_CANDIDATE_MIN = 20
RERANK_CANDIDATE_MAX = 150

# --- Engine-side defaults (ours, not the reference's) ---
# Number of term-hash buckets the persisted postings table is
# partitioned by; queries prune partitions by the hash of their terms.
DEFAULT_TERM_BUCKETS = 64
# Salt fan-out for head-term skew in posting assembly (SURVEY §4.2).
DEFAULT_SALT_PARTITIONS = 16
# Decimal places scores are rounded to when a query needs
# cross-engine-stable ordering (engine vs SQL oracle).
SCORE_ROUND_DP = 6
