"""Crafted-input tests for the round-5 batch-17 keys: relational
division, WITH-TIES top-k, header/lines reconciliation, inter-arrival
histograms, and 3-step path analysis.
"""

from __future__ import annotations

import datetime as dt

from movierecommender_sentimentanalysissytem_spark import registry

QS = registry.queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

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

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


import pytest

# Heavyweight evidence tier: quality sweeps / scaled corpora /
# multi-second Spark jobs. Fast iteration path: pytest -m "not slow".
pytestmark = pytest.mark.slow


def _write(spark, out: str, name: str, rows, schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/{name}.parquet")


def _order(key, cust, prio):
    return (key, cust, "O", 100.0, dt.date(2024, 1, 1), prio)


def test_relational_division_requires_all_divisor_values(
    spark, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("div"))
    orders = [
        _order(1, 1, "1-URGENT"),   # cust 1 covers both priorities
        _order(2, 1, "2-HIGH"),
        _order(3, 2, "1-URGENT"),   # cust 2 covers only one
        _order(4, 3, "1-URGENT"),   # cust 3 covers both, with repeats
        _order(5, 3, "2-HIGH"),
        _order(6, 3, "2-HIGH"),
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    got = {
        r["custkey"]: r["n_priorities"]
        for r in QS["subq_relational_division"](spark, out).collect()
    }
    assert got == {1: 2, 3: 2}


def test_topk_with_ties_keeps_peers_and_marks_overflow(
    spark, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("ties"))
    cust = [
        # segment A: distinct bands 9,9,8,7 -> rank 1,1,3,4
        (1, "a", 1, 950.0, "A"),
        (2, "b", 1, 930.0, "A"),
        (3, "c", 1, 850.0, "A"),
        (4, "d", 1, 750.0, "A"),
        # segment B: four-way tie at rank 1 -> all kept WITH TIES,
        # exactly one would have been dropped by row_number <= 3
        (5, "e", 1, 500.0, "B"),
        (6, "f", 1, 510.0, "B"),
        (7, "g", 1, 520.0, "B"),
        (8, "h", 1, 530.0, "B"),
    ]
    _write(
        spark, out, "customer", cust,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    rows = QS["win_topk_with_ties"](spark, out).collect()
    a = {r["custkey"]: r for r in rows if r["segment"] == "A"}
    assert set(a) == {1, 2, 3}  # rank 4 (band 7) is cut
    assert a[1]["rnk"] == 1 and a[2]["rnk"] == 1 and a[3]["rnk"] == 3
    assert not any(r["is_tie_overflow"] for r in a.values())
    b = {r["custkey"]: r for r in rows if r["segment"] == "B"}
    assert set(b) == {5, 6, 7, 8}  # WITH TIES keeps all four peers
    assert all(r["rnk"] == 1 for r in b.values())
    # the tie-break order is custkey asc, so 8 is the overflow row
    assert [k for k, r in b.items() if r["is_tie_overflow"]] == [8]


def test_order_reconcile_classes(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rec"))
    d = dt.date(2024, 1, 1)
    orders = [
        (1, 1, "O", 100.0, d, "1-URGENT"),  # matches exactly
        (2, 1, "O", 100.0, d, "1-URGENT"),  # lines sum to 90 -> mismatch
        (3, 1, "O", 100.0, d, "1-URGENT"),  # no lines at all
    ]
    li = [
        (1, 1, 1, 1, 1.0, 60.0, 0.0, 0.0, "N", "O", d),
        (1, 2, 1, 2, 1.0, 40.0, 0.0, 0.0, "N", "O", d),
        (2, 1, 1, 1, 1.0, 90.0, 0.0, 0.0, "N", "O", d),
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    r = QS["quality_order_reconcile"](spark, out).collect()[0]
    assert r["n_orders"] == 3
    assert r["n_without_lines"] == 1
    assert r["n_within_1pct"] == 1
    assert r["n_mismatched"] == 1
    assert (r["min_ratio"], r["max_ratio"]) == (0.9, 1.0)


def test_interarrival_buckets_and_cap(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gap"))

    def ev(eid, uid, secs):
        return (eid, T0 + dt.timedelta(seconds=secs), uid, "click", 1.0, "{}")

    rows = [
        ev(1, 1, 0),
        ev(2, 1, 30),      # gap 30 s  -> bucket 0
        ev(3, 1, 120),     # gap 90 s  -> bucket 1
        ev(4, 1, 7320),    # gap 7200 s -> capped at bucket 60
        ev(5, 2, 0),       # lone first event: no gap emitted
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    got = {
        r["bucket_min"]: r["n"]
        for r in QS["events_interarrival_histogram"](spark, out).collect()
    }
    assert got == {0: 1, 1: 1, 60: 1}


def test_path_analysis_trigrams(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("path"))

    def ev(eid, uid, typ, secs):
        return (eid, T0 + dt.timedelta(seconds=secs), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "a", 0), ev(2, 1, "b", 1), ev(3, 1, "c", 2),
        ev(4, 1, "d", 3),
        ev(5, 2, "a", 0), ev(6, 2, "b", 1), ev(7, 2, "c", 2),
        ev(8, 3, "a", 0), ev(9, 3, "b", 1),  # 2-event user: no trigram
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    rows_out = QS["events_path_analysis"](spark, out).collect()
    got = {r["path"]: r["n"] for r in rows_out}
    assert got == {"a>b>c": 2, "b>c>d": 1}
    assert rows_out[0]["path"] == "a>b>c"  # ordered by count desc
