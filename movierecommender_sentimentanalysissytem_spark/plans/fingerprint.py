"""Physical-plan fingerprints: a compact, environment-stable summary of
each query's plan shape, for snapshot-diff regression testing.

The static audit (plans/audit.py) catches absolute pathologies
(CartesianProduct, unreviewed nested loops, single-partition sorts); a
fingerprint catches RELATIVE regressions the audit is blind to — a
broadcast join silently degrading to sort-merge, an extra exchange
appearing in a lineage, a scan duplicating because a cache stopped
being reused. Those are exactly the changes that keep a plan "legal"
while multiplying its cost at 100 TB.

A fingerprint's OUTPUT is derived only from plan-tree node names —
never from partition counts, temp paths, or statistics — so it is
stable across runs, shuffle-partition settings, and fixture scale
factors, while still pinning the strategy-level shape. Node ids are
consulted for exactly one thing: deduplicating repeated printings of
the same physical node within one explain dump (cached subplans are
printed once per reference); they never reach the fingerprint itself.
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


_NODE_RE = re.compile(
    r"^[:+\-| ]*\*?\s*\(?\d*\)?\s*([A-Za-z][\w ]*?)\s*\((\d+)\)"
)


def _content_col(raw: str) -> int:
    j = 0
    while j < len(raw) and raw[j] in ":+-| ":
        j += 1
    return j


def fingerprint(plan: str) -> dict[str, int]:
    """Summarize a ``explain("formatted")`` string into node counts.

    Only the tree section is parsed (the detail blocks repeat node
    names); arguments are ignored. Two normalizations keep the counts
    meaningful in the presence of cached subplans (r14):

    - every node is counted ONCE per plan id — an InMemoryRelation's
      inner plan is printed verbatim under each of its references
      (with the SAME node ids), so without the dedup a 4-reference
      cache inflated every inner operator 4x and drowned real
      regressions in reference-count noise;
    - ``== Initial Plan ==`` sections are skipped — a MATERIALIZED
      cache (scoped_persist is eager since r14) prints its
      AdaptiveSparkPlan as final+initial plan pairs, and the initial
      copy duplicates the final one with fresh node ids.
    """
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    counts: dict[str, int] = {}
    # Dedup key is (name, id), not the bare id (r14 advice): cached
    # subplans (InMemoryRelation inner plans) are numbered in a
    # separate pass from the outer tree, so ids from two different
    # caches — or an inner plan vs the outer tree — can collide, and a
    # bare-id key would silently merge genuinely distinct operators.
    # A same-name collision is still conceivable but can only mis-drop
    # a node of the same operator class (bounded error) instead of
    # silently hiding a different operator entirely.
    seen_ids: set[tuple[str, str]] = set()
    i, n = 0, len(lines)
    while i < n:
        raw = lines[i]
        col = _content_col(raw)
        if raw[col:].startswith("== Initial Plan =="):
            # the section's nodes print at column >= the marker's own
            # (the first child is aligned UNDER the "=="), so consume
            # until a real dedent
            i += 1
            while i < n and _content_col(lines[i]) >= col:
                i += 1
            continue
        i += 1
        m = _NODE_RE.match(raw)
        if not m:
            continue
        name, node_id = m.group(1).strip(), m.group(2)
        if (name, node_id) in seen_ids:
            continue
        seen_ids.add((name, node_id))
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
