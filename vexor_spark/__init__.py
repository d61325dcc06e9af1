"""vexor_spark — a PySpark-native inverted-index + BM25 retrieval engine.

A from-scratch distributed rebuild of the indexing-and-retrieval core of
scarletkc/vexor (reference at /root/reference): tokenization, posting-list
construction, delta-gap+varint compression, BM25 top-k scoring, RRF rank
fusion, and resumable incremental index builds — expressed as idiomatic
PySpark DataFrame programs (Catalyst-optimizable, vectorized Arrow/pandas
UDFs only where built-ins cannot express the semantics).

Nothing in this package is a port of the reference's code; the reference
defines *what* to compute (formulas, tie-breaks, caps — cited per module
as file:line), the architecture here is Spark-first.
"""

__version__ = "0.1.0"

from vexor_spark import constants  # noqa: F401
