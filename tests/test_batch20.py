"""Crafted-input tests for the round-5 batch-20 keys: the exact-oracle
Lloyd iteration and rule-based bot detection.
"""

from __future__ import annotations

import datetime as dt
import math

from movierecommender_sentimentanalysissytem_spark import registry

QS = registry.queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


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


def _vec(x0: float):
    return [float(x0)] + [0.0] * 63


def test_kmeans_lloyd_reassignment_after_mean_update(
    spark, tmp_path_factory
):
    # 1-D geometry in a 64-dim shell. Seeds are vec_ids 0..3 at
    # x = 0, 10, 20, 30. Pass 1: 4.9 and 4.4 join cluster 0, 5.1
    # joins cluster 1 (|5.1-10| < |5.1-0|). Mean update pulls
    # cluster 0 to x = 3.1 and cluster 1 to 7.55 — pass 2 moves 5.1
    # into cluster 0 (dist 4.0 < 6.0); everything else stays.
    out = str(tmp_path_factory.mktemp("lloyd"))
    vecs = [
        (0, _vec(0.0), 0),
        (1, _vec(10.0), 0),
        (2, _vec(20.0), 0),
        (3, _vec(30.0), 0),
        (4, _vec(4.9), 0),
        (5, _vec(4.4), 0),
        (6, _vec(5.1), 0),
    ]
    _write(
        spark, out, "embeddings", vecs,
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["vec_id"]: r for r in QS["ml_kmeans_lloyd"](spark, out).collect()}
    assert (got[6]["c1"], got[6]["c2"], got[6]["moved"]) == (1, 0, True)
    for vid, want in [(0, 0), (1, 1), (2, 2), (3, 3), (4, 0), (5, 0)]:
        assert (got[vid]["c1"], got[vid]["c2"]) == (want, want)
        assert got[vid]["moved"] is False
    # seeds sit exactly on their pass-1 centroid
    assert got[2]["dist2"] == 0.0 and got[3]["dist2"] == 0.0


def test_bot_detection_flags_low_entropy_hammering(
    spark, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("bots"))
    rows = []
    eid = 0
    # the bot: 60 identical events inside one day
    for k in range(60):
        eid += 1
        rows.append(
            (eid, T0 + dt.timedelta(minutes=10 * k), 999, "click", 1.0, "{}")
        )
    # 8 normal users: 10 events over 30 days, all five types
    types = ["click", "view", "purchase", "search", "error"]
    for uid in range(1, 9):
        for k in range(10):
            eid += 1
            rows.append(
                (
                    eid,
                    T0 + dt.timedelta(days=3 * k, hours=uid),
                    uid,
                    types[k % 5],
                    1.0,
                    "{}",
                )
            )
    _write(
        spark, out, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["user_id"]: r for r in
           QS["events_bot_detection"](spark, out).collect()}
    bot = got[999]
    assert bot["is_bot"] is True
    assert bot["type_entropy"] == 0.0
    assert bot["rate_z"] > 1.5
    for uid in range(1, 9):
        r = got[uid]
        assert r["is_bot"] is False
        # 10 events, uniform over 5 types -> H = ln 5
        assert r["type_entropy"] == _round4(math.log(5))


_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate date, o_orderpriority string"
)


def _order(key, cust, day):
    return (key, cust, "O", 100.0, day, "1-URGENT")


def test_kaplan_meier_censoring_and_survival_steps(
    spark, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("km"))
    d = dt.date
    orders = [
        # u1, u2: dur 10, last order far before the 90-day horizon
        _order(1, 1, d(2024, 1, 1)), _order(2, 1, d(2024, 1, 11)),
        _order(3, 2, d(2024, 1, 1)), _order(4, 2, d(2024, 1, 11)),
        # u3: dur 20, churned
        _order(5, 3, d(2024, 1, 1)), _order(6, 3, d(2024, 1, 21)),
        # u4: dur 20 but recent -> censored
        _order(7, 4, d(2024, 11, 1)), _order(8, 4, d(2024, 11, 21)),
        # u5: single order ON the dataset max date -> dur 0, censored
        _order(9, 5, d(2024, 12, 31)),
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    rows = {r["dur"]: r for r in QS["stats_kaplan_meier"](spark, out).collect()}
    assert set(rows) == {0, 10, 20}
    r0, r10, r20 = rows[0], rows[10], rows[20]
    assert (r0["d"], r0["c"], r0["at_risk"], r0["s"]) == (0, 1, 5, 1.0)
    assert (r10["d"], r10["c"], r10["at_risk"], r10["s"]) == (2, 0, 4, 0.5)
    # at dur 20: one churn, one censored, 2 at risk -> S = 0.5 * 0.5
    assert (r20["d"], r20["c"], r20["at_risk"], r20["s"]) == (1, 1, 2, 0.25)


def test_kaplan_meier_extinction_pins_zero_not_skip(
    spark, tmp_path_factory
):
    # the d = at_risk terminal case must yield S = 0, NOT skip the
    # ln(0) factor (a NULL inside SUM would silently drop it and
    # leave S at its previous value)
    out = str(tmp_path_factory.mktemp("km0"))
    d = dt.date
    orders = [
        _order(1, 1, d(2024, 1, 1)), _order(2, 1, d(2024, 1, 6)),
        _order(3, 2, d(2024, 1, 1)), _order(4, 2, d(2024, 1, 6)),
        _order(5, 3, d(2024, 12, 31)),  # defines the horizon, censored
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    rows = {r["dur"]: r for r in QS["stats_kaplan_meier"](spark, out).collect()}
    assert rows[5]["d"] == 2 and rows[5]["at_risk"] == 2
    assert rows[5]["s"] == 0.0


def test_json_permissive_quarantine_split(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jsonmal"))
    d = dt.date(2024, 1, 1)
    orders = [
        (k, 1, "O", float(10 * k), d, "1-URGENT") for k in (24, 25, 50, 51)
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    r = QS["scan_json_permissive_corrupt"](spark, out).collect()[0]
    # slice o_orderkey % 25 == 0 -> keys 25 and 50 survive as valid
    assert (r["n_valid"], r["n_corrupt"]) == (2, 3)
    assert r["total"] == 250.0 + 500.0
