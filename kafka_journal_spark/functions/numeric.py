"""Cross-engine deterministic quantization.

``round(double, 6)`` is NOT portable: Spark rounds the value's shortest
decimal representation half-up (via BigDecimal), DuckDB rounds the binary
value — they disagree whenever the shortest repr ends in a 5 at the 7th
digit (e.g. a quality score of 0.5186875 → Spark 0.518688, DuckDB 0.518687).

``floor(x * 1e6 + 0.5) / 1e6`` is pure IEEE double arithmetic — identical
ops in identical order — so both engines produce bit-identical doubles.
Every float-derived gate output goes through this instead of round().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round6(col: Column) -> Column:
    """Quantize a double to 6 decimals, deterministically across engines.

    NON-NEGATIVE INPUTS ONLY: floor(x*1e6 + 0.5) rounds halves toward
    +infinity, which for negative values differs from ROUND's
    half-away-from-zero (e.g. -0.0000005 -> -0.0 here, -0.000001 by ROUND).
    Both engines stay bit-identical either way, but a signed caller would
    get asymmetric rounding — all current call sites quantize ratios,
    scores, and norms, which are >= 0 by construction.
    """
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def round6_sql(x: str) -> str:
    """The DuckDB-side twin of :func:`round6` (same non-negative-input
    assumption)."""
    return f"(FLOOR(({x}) * 1000000.0 + 0.5) / 1000000.0)"


def round6_sql_spark(x: str) -> str:
    """The Spark-SQL-string twin of :func:`round6` (r11 §4 pattern): the
    ``D`` suffixes pin the literals to DOUBLE exactly like ``F.lit(1e6)``,
    so the parsed tree is the Column tree term for term."""
    return f"(floor(({x}) * 1000000.0D + 0.5D) / 1000000.0D)"
