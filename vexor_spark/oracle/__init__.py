"""Pure-Python oracle mirroring the reference's semantics exactly.

Test-only: the Spark engine is asserted equal to this module (postings,
stats, scores, top-k ranks). Implemented from the reference's *behavior*
(cited file:line per function) — small scalar functions whose formulas
are the compatibility contract, not engine code.
"""

from vexor_spark.oracle.pyref import (  # noqa: F401
    build_document,
    chunk_full,
    cleanup_snippet,
    extract_text,
    rrf_fuse,
    score_postings,
    term_frequencies,
    tokenize,
    top_k,
    trim_preview,
)
