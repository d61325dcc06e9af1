"""Driver-side replica of Spark's F.round for doubles.

Spark's Round(DoubleType) computes
`BigDecimal.valueOf(x).setScale(dp, HALF_UP).toDouble`, and
`BigDecimal.valueOf` goes through `Double.toString` — the SHORTEST
round-trip decimal representation. Python's `repr(float)` is the same
shortest representation, so `Decimal(repr(x))` + ROUND_HALF_UP
reproduces F.round bit-for-bit. Python's builtin `round()` would NOT
(banker's rounding over the exact binary expansion).

Used wherever a bounded top-k is ranked on the driver so the rounded
scores stay identical to the JVM plans and the DuckDB oracles.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, dp: int) -> float:
    return float(Decimal(repr(float(x))).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP))
