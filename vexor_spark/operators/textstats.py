"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These extend the reference's keyword/text surface (SURVEY T8) with the
operations a 100 TB web-corpus curation pipeline needs. Everything is
built-in column algebra (whole-stage codegen); the only "custom" piece
is a cross-engine-deterministic polynomial hash used so every operator
has an exact DuckDB oracle:

    h(s) = fold(codepoints(s), acc -> (acc*31 + cp) % (2^31 - 1))

(Engine-internal paths that don't need SQL parity should prefer
xxhash64 — JVM, faster, 64-bit.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MOD = 2_147_483_647  # 2^31 - 1

# Tiny per-language stopword sets (deterministic, embedded in both the
# Spark plan and the SQL oracle). Order matters for tie-breaks.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "mit", "für", "auf", "ein", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "pour", "avec", "dans", "une", "pas"),
    "es": ("el", "la", "los", "y", "es", "para", "con", "en", "una", "no"),
}
LANG_ORDER = tuple(LANG_STOPWORDS)  # tie-break priority

# BPE-ish token regex: letter runs, digit runs, single non-space symbol.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def poly_hash_col(s: Column) -> Column:
    """Cross-engine string hash (see module docstring). DuckDB mirror:
    list_reduce(list_transform(string_split(s,''), c -> ascii(c)::BIGINT),
                (a, b) -> (a*31 + b) % 2147483647)."""
    codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(HASH_MOD),
    )


def fingerprint_col(text: Column) -> Column:
    """Whole-document rolling-hash fingerprint (T10 analog at doc
    level). Same value as poly_hash_col, computed by the vectorized
    Arrow kernel (functions/fasthash.py — the per-character HOF fold
    costs an interpreted expression eval per char; whole documents are
    the worst case)."""
    from vexor_spark.functions.fasthash import poly_hash_text_udf

    return poly_hash_text_udf(text)


def ws_token_count_col(text: Column) -> Column:
    """Whitespace token count; 0 for blank text."""
    trimmed = F.regexp_replace(text, r"^\s+|\s+$", "")
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish token count (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)).cast("long")


def _stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lit, t))).cast("long")


def lang_scores(tokens: Column) -> dict[str, Column]:
    """Per-language stopword hit counts (duplicates counted)."""
    return {lang: _stopword_hits(tokens, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id_col(tokens: Column) -> Column:
    """Heuristic language ID: argmax stopword hits, ties broken by
    LANG_ORDER; 'und' (undetermined) when no stopword matches."""
    scores = lang_scores(tokens)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score_col(tokens: Column, text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]:
        0.4·min(n_tokens/50, 1)            — length credit
      + 0.3·min(stop_ratio/0.08, 1)        — natural-language-ness
      + 0.3·alpha_ratio                    — alphabetic token fraction
    (engine-defined; the reference has no quality scorer)."""
    n = F.size(tokens).cast("double")
    stop_hits = sum(lang_scores(tokens).values(), F.lit(0).cast("long")).cast("double")
    alpha = F.size(F.filter(tokens, lambda t: t.rlike("^[a-z]+$"))).cast("double")
    stop_ratio = F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    len_credit = F.least(n / F.lit(50.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_credit
        + F.lit(0.3) * F.least(stop_ratio / F.lit(0.08), F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
    )


def token_stats_table(
    docs: DataFrame, tokens_col: str = "tokens", *, id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, hits_<lang>…, alpha_tokens) for a whole corpus in
    ONE explode + two-phase codegen aggregation.

    The per-row Column forms (lang_scores / quality_score_col) build on
    `F.filter` HOF lambdas — CodegenFallback, re-evaluated per
    consuming expression (no CSE), measured ~4–5 s per scan at 50k
    docs. Here every token is a row and the per-language hits are
    plain `isin` conditions under `sum` — whole-stage codegen with
    map-side partial aggregation, one shuffle of |docs| groups
    (~0.7 s on the same input). Duplicates count (like
    _stopword_hits); tokenless docs survive explode_outer with
    n_tokens 0. lang_id_from_stats / quality_from_stats reproduce the
    Column forms' exact arithmetic from these counts."""
    exploded = docs.select(id_col, F.explode_outer(tokens_col).alias("t"))
    aggs = [F.count("t").alias("n_tokens")]
    for lang, words in LANG_STOPWORDS.items():
        aggs.append(
            F.sum(F.when(F.col("t").isin(*words), 1).otherwise(0)).alias(f"hits_{lang}")
        )
    aggs.append(
        F.sum(F.when(F.col("t").rlike("^[a-z]+$"), 1).otherwise(0)).alias(
            "alpha_tokens"
        )
    )
    return exploded.groupBy(id_col).agg(*aggs)


def lang_id_from_stats() -> Column:
    """argmax-with-LANG_ORDER-ties over the hits_<lang> columns of
    token_stats_table — same decision rule as lang_id_col."""
    hits = {lang: F.coalesce(F.col(f"hits_{lang}"), F.lit(0)) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_from_stats() -> Column:
    """quality_score_col's exact arithmetic over token_stats_table
    columns (n_tokens / Σ hits / alpha_tokens)."""
    n = F.col("n_tokens").cast("double")
    stop_hits = sum(
        (F.coalesce(F.col(f"hits_{lang}"), F.lit(0)) for lang in LANG_STOPWORDS),
        F.lit(0),
    ).cast("double")
    alpha = F.coalesce(F.col("alpha_tokens"), F.lit(0)).cast("double")
    stop_ratio = F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    len_credit = F.least(n / F.lit(50.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_credit
        + F.lit(0.3) * F.least(stop_ratio / F.lit(0.08), F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
    )
