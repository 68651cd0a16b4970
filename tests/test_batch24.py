"""Crafted-input tests for the round-8 staged batch: coverage@k curve,
n-gram containment dedup, the paired permutation test, the sequence-gap
audit, and point-in-polygon. Each fixture is built so the expected
output is known by construction (hand-computable), independent of the
DuckDB oracle."""

from __future__ import annotations

import datetime as dt
import math

from movierecommender_sentimentanalysissytem_spark import registry
from tests.conftest import SF_ORACLE

QS = registry.queries()

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate date, o_orderpriority string"
)

_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate date"
)

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_D = dt.date(2024, 1, 1)


import pytest

# Heavyweight evidence tier: quality sweeps / scaled corpora /
# multi-second Spark jobs. Fast iteration path: pytest -m "not slow".
pytestmark = pytest.mark.slow


def _write(spark, out: str, name: str, rows, schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/{name}.parquet")


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000


def _li(ok, item, qty=1.0, line=1):
    return (ok, item, 1, line, qty, 100.0, 0.0, 0.0, "N", "O", _D)


def _order(ok, user):
    return (ok, user, "O", 100.0, _D, "1-URGENT")


def test_coverage_at_k_curve_by_construction(spark, tmp_path_factory):
    """Train ranks items 1-5 by count (5,4,3,2,1 interactions). Test
    users hold items at known best ranks: u100→rk1, u200→rk3,
    u300→rk5 (plus an uncovered item), u400→uncovered only. The whole
    hit-rate / item-coverage curve follows by hand."""
    out = str(tmp_path_factory.mktemp("cov"))
    orders, li, ok = [], [], 0
    # train fold: ok % 4 != 0 — item i gets (6 - i) interactions
    for item in range(1, 6):
        for _ in range(6 - item):
            ok += 1
            if ok % 4 == 0:
                ok += 1
            orders.append(_order(ok, 9000 + ok))
            li.append(_li(ok, item))
    # test fold: ok % 4 == 0
    for tk, (user, items) in enumerate(
        [(100, [1]), (200, [3]), (300, [5, 999]), (400, [888])]
    ):
        o = 4 * (tk + 100)
        orders.append(_order(o, user))
        for j, item in enumerate(items, start=1):
            li.append(_li(o, item, line=j))
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    _write(spark, out, "lineitem", li, _LI_SCHEMA)

    rows = {r.k: r for r in QS["rec_eval_coverage_at_k"](spark, out).collect()}
    assert set(rows) == {1, 3, 5, 10}
    for k, users_hit, items_cov in [(1, 1, 1), (3, 2, 2), (5, 3, 3), (10, 3, 3)]:
        r = rows[k]
        assert r.n_users == 4 and r.n_users_hit == users_hit, (k, r)
        assert r.hit_rate == _round4(users_hit / 4)
        assert r.n_test_items == 5 and r.n_test_items_covered == items_cov
        assert r.item_coverage == _round4(items_cov / 5)


def test_ngram_containment_subsumption_and_stop_shingle_cap(
    spark, tmp_path_factory
):
    """Doc 1's full shingle set appears contiguously inside doc 2 →
    containment exactly 1.0 (the asymmetric case Jaccard's length
    band would block). 25 boilerplate docs share ONLY one stop
    shingle (> 20 docs) — the cap must drop it, producing zero pairs
    among them."""
    out = str(tmp_path_factory.mktemp("containment"))
    docs = [
        (1, "alpha beta gamma delta", "en", "s", 22),
        (2, "alpha beta gamma delta extra1 extra2 extra3", "en", "s", 43),
        (3, "omega psi chi phi", "en", "s", 17),
    ]
    for i in range(25):
        docs.append(
            (10 + i, f"zz yy xx tail{i}a tail{i}b", "en", "s", 24)
        )
    _write(spark, out, "documents", docs, _DOCS_SCHEMA)

    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in QS["dedup_ngram_containment"](spark, out).collect()
    }
    assert got == {(1, 2): 1.0}, got


def test_paired_permutation_strong_effect_and_null(spark, tmp_path_factory):
    """Strong uniform effect: every user spends 10.00 on an even day
    and 1.00 on an odd day → stat_obs = 900 cents exactly. Null case:
    identical spend both days → every permutation statistic equals 0
    ≥ stat_obs = 0, so n_ge = 99 and p = 1.0 REGARDLESS of the hash
    draw (sign flips of zero diffs are all zero)."""
    out = str(tmp_path_factory.mktemp("pairperm"))
    ev = []
    for u in range(1, 9):
        ev.append((2 * u, dt.datetime(2024, 1, 2, 10, 0), u, "p", 10.0, "{}"))
        ev.append((2 * u + 1, dt.datetime(2024, 1, 3, 10, 0), u, "p", 1.0, "{}"))
    _write(spark, out, "events", ev, _EVENTS_SCHEMA)
    r = QS["stats_permutation_test_paired"](spark, out).collect()[0]
    assert r.n_users == 8 and r.n_perm == 99
    assert r.stat_obs_cents == 900.0
    assert r.p_value <= 0.05, r  # only all-same-sign perms tie 900

    out2 = str(tmp_path_factory.mktemp("pairperm_null"))
    ev2 = []
    for u in range(1, 9):
        ev2.append((2 * u, dt.datetime(2024, 1, 2, 10, 0), u, "p", 5.0, "{}"))
        ev2.append((2 * u + 1, dt.datetime(2024, 1, 3, 10, 0), u, "p", 5.0, "{}"))
    _write(spark, out2, "events", ev2, _EVENTS_SCHEMA)
    r2 = QS["stats_permutation_test_paired"](spark, out2).collect()[0]
    assert r2.stat_obs_cents == 0.0
    assert r2.n_ge == 99 and r2.p_value == 1.0


def test_seq_gap_audit_by_construction(spark, tmp_path_factory):
    """Type 'a': ids [1,2,3,10] → 6 missing, density 0.4, max gap 7.
    Type 'b': ids [5,5,6] → one duplicate id; missing goes NEGATIVE
    (span 2 < n 3) — the duplicate signature the audit must surface,
    not mask."""
    out = str(tmp_path_factory.mktemp("seqgap"))
    ts = dt.datetime(2024, 1, 1, 0, 0)
    ev = [(i, ts, 1, "a", 1.0, "{}") for i in (1, 2, 3, 10)]
    ev += [(i, ts, 1, "b", 1.0, "{}") for i in (5, 5, 6)]
    _write(spark, out, "events", ev, _EVENTS_SCHEMA)
    rows = {r.event_type: r for r in QS["quality_seq_gap_audit"](spark, out).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.n, a.min_id, a.max_id, a.missing) == (4, 1, 10, 6)
    assert a.density == _round4(0.4)
    assert a.max_adjacent_gap == 7 and a.n_duplicate_ids == 0
    assert (b.n, b.min_id, b.max_id, b.missing) == (3, 5, 6, -1)
    assert b.max_adjacent_gap == 1 and b.n_duplicate_ids == 1


def _pnpoly(verts, x, y):
    """Independent reference ray cast (W. R. Franklin's pnpoly loop
    form, j-trailing-i instead of the engine's modular fold)."""
    inside = False
    j = len(verts) - 1
    for i in range(len(verts)):
        xi, yi = verts[i]
        xj, yj = verts[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def test_point_in_polygon_matches_reference_ray_cast(spark):
    """Full sf0.01 comparison against an independently-structured
    pure-Python pnpoly (trailing-j loop vs the engine's modular
    fold): identical (custkey, polygon) membership sets, and every
    polygon — including the non-convex chevron — catches at least
    one point. (sf0.01, not sf0.001: the coordinate lattice of the
    150 smallest keys happens to miss the triangle entirely.)

    Convention dependence (round-8 advice): the two formulations
    compute each edge's x-intercept from OPPOSITE endpoints
    (pnpoly anchors at vertex i with slope toward j; the engine
    anchors at the edge's own start vertex), which is mathematically
    but not bit-identical — a point whose x lies within ~1 ulp of an
    intercept could classify differently. The exact set-equality below
    is safe for THIS fixture because the coordinate lattice is
    0.1-granular ([0, 99.9] in tenths) and the polygon vertices are
    small integers/halves, so every intercept comparison has slack
    ≫ 1 ulp. If the polygon constants or the key→coordinate hash ever
    change, re-check that slack (or exclude points within a guard band
    of an intercept) before trusting exact equality."""
    from movierecommender_sentimentanalysissytem_spark.operators.joins import (
        _PIP_POLYGONS,
    )
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table

    sf = SF_ORACLE
    keys = [r.c_custkey for r in table(spark, sf, "customer").select("c_custkey").collect()]
    expected = set()
    for k in keys:
        x = ((k * 131) % 1000) / 10.0
        y = ((k * 197) % 1000) / 10.0
        for pid, verts in _PIP_POLYGONS:
            if _pnpoly(verts, x, y):
                expected.add((k, pid))
    got = {
        (r.c_custkey, r.polygon_id)
        for r in QS["geo_point_in_polygon"](spark, sf).collect()
    }
    assert got == expected
    assert {pid for _, pid in got} == {1, 2, 3}


def test_containment_dominates_jaccard_on_shared_pairs(spark):
    """Metamorphic cross-key invariant: for any doc pair,
    containment = |A∩B| / min(|A|,|B|) ≥ |A∩B| / |A∪B| = jaccard
    (min ≤ union always). Checked on the live sf0.01 fixture over the
    pairs both keys emit — a shared-shingle-pipeline regression in
    either key that skews one ratio breaks the dominance."""
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QS["dedup_ngram_jaccard"](spark, SF_ORACLE).collect()
    }
    con = {
        (r.doc_a, r.doc_b): r.containment
        for r in QS["dedup_ngram_containment"](spark, SF_ORACLE).collect()
    }
    shared = set(jac) & set(con)
    assert shared, "expected at least one pair emitted by both keys"
    for p in shared:
        assert con[p] >= jac[p] - 1e-9, (p, con[p], jac[p])
