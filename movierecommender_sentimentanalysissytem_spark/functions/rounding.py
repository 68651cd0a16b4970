"""Cross-engine-stable rounding.

``ROUND(x, 4)`` disagrees between Spark (BigDecimal HALF_UP on the
exact decimal expansion of the double) and DuckDB (scaled-double
rounding) when a value lands within an ulp of a .00005 boundary —
observed on the fixtures (~1 row in 17k). ``floor(x*10000 + 0.5)/10000``
is pure IEEE double arithmetic, so both engines compute bit-identical
results on bit-identical inputs. Use this pair whenever per-row doubles
are projected; plain ROUND stays fine for values verified exact at the
graded scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column) -> Column:
    """Spark side of the stable 4-dp round (pairs with ``ROUND4_SQL``)."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def round4_sql(expr: str) -> str:
    """DuckDB side of the stable 4-dp round."""
    return f"FLOOR(({expr}) * 10000 + 0.5) / 10000"

# Saturation bound (found live by stats_anova_oneway's sf0.1 parity
# run): Spark's floor(double) returns LONG, so round4 SATURATES at
# Long.MaxValue for |x| >= ~9.223e14 (DuckDB's floor stays double and
# doesn't) — the rounded value silently pins to 922337203685477.58...
# and the engines diverge. Keys must not round4 unbounded-growth
# magnitudes (raw sums of squares, grand totals at extreme SF):
# normalize first (per-row, per-dof, per-group means) so the rounded
# quantity is scale-stable. Everything below ~1e14 is safe.
