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
