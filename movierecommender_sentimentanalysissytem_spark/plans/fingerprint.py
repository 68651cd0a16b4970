"""Physical-plan fingerprints: a compact, environment-stable summary of
each query's plan shape, for snapshot-diff regression testing.

The static audit (plans/audit.py) catches absolute pathologies
(CartesianProduct, unreviewed nested loops, single-partition sorts); a
fingerprint catches RELATIVE regressions the audit is blind to — a
broadcast join silently degrading to sort-merge, an extra exchange
appearing in a lineage, a scan duplicating because a cache stopped
being reused. Those are exactly the changes that keep a plan "legal"
while multiplying its cost at 100 TB.

A fingerprint is derived ONLY from plan-tree node names — never from
ids, partition counts, temp paths, or statistics — so it is stable
across runs, shuffle-partition settings, and fixture scale factors,
while still pinning the strategy-level shape.
"""

from __future__ import annotations

import re

# Node-name prefixes that define the fingerprint. Keep strategy-level:
# join algorithms, exchanges, scans, generates, windows, sorts.
_COUNTED = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange",
    "BroadcastExchange",
    "Scan parquet",
    "InMemoryTableScan",
    "Generate",
    "Window",
    "WindowGroupLimit",
    "Sort",
    "TakeOrderedAndProject",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Expand",
)


def fingerprint(plan: str) -> dict[str, int]:
    """Summarize a ``explain("formatted")`` string into node counts.

    Only the tree section is parsed (the detail blocks repeat node
    names); node ids and arguments are ignored.
    """
    tree = plan.split("\n\n")[0]
    counts: dict[str, int] = {}
    for raw in tree.splitlines():
        m = re.match(r"^[:+\-| ]*\*?\(?\d*\)?\s*([A-Za-z][\w ]*?)\s*\(\d+\)", raw)
        if not m:
            continue
        name = m.group(1).strip()
        for prefix in _COUNTED:
            if name.startswith(prefix):
                # normalize join subtypes (Inner/LeftOuter/...) away:
                # the STRATEGY is the fingerprint, the type is the
                # query's semantics and already oracle-checked
                counts[prefix] = counts.get(prefix, 0) + 1
                break
    return counts


def collect(spark, sf_dir: str, keys=None) -> dict[str, dict[str, int]]:
    """Fingerprint every (non-skipped) registered query."""
    import contextlib
    import io

    from movierecommender_sentimentanalysissytem_spark import registry
    from movierecommender_sentimentanalysissytem_spark.plans.audit import SKIP

    qs = registry.queries()
    out: dict[str, dict[str, int]] = {}
    for key in sorted(qs):
        if key in SKIP or (keys is not None and key not in keys):
            continue
        try:
            df = qs[key](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            out[key] = fingerprint(buf.getvalue())
        except Exception as exc:  # noqa: BLE001
            out[key] = {"__error__": str(exc)[:80]}
    return out
