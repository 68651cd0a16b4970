"""Crafted-input tests for the round-5 batch-16 keys: classification
evaluation, multi-touch attribution, decayed popularity, seasonal
baselines, Wilson intervals, and candidate-key profiling.

Same contract as test_inferential.py / test_batch6.py: tiny parquet
fixtures with KNOWN closed-form answers, run end-to-end through the
registered query (the driver's exact path).
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


_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate date"
)

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate date, o_orderpriority string"
)


def _li_row(key, qty, disc, tax, flag):
    return (
        key, 1, 1, 1, float(qty), 100.0, float(disc), float(tax),
        flag, "O", dt.date(2024, 1, 1),
    )


def test_eval_classification_confusion_and_metrics(spark, tmp_path_factory):
    # z = -1 + 0.1*qty - 2*disc + 5*tax; label = (flag == 'R').
    # qty=20 -> z=1 (pred+), qty=0 -> z=-1 (pred-), qty=10 -> z=0:
    # the decision contract is z >= 0, so the boundary row predicts +.
    out = str(tmp_path_factory.mktemp("cls"))
    rows = [
        _li_row(1, 20, 0, 0, "R"),  # TP
        _li_row(2, 10, 0, 0, "R"),  # TP (z = 0 boundary)
        _li_row(3, 20, 0, 0, "N"),  # FP
        _li_row(4, 0, 0, 0, "R"),   # FN
        _li_row(5, 0, 0, 0, "N"),   # TN
    ]
    _write(spark, out, "lineitem", rows, _LI_SCHEMA)
    r = QS["ml_eval_classification"](spark, out).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 1)
    assert r["accuracy"] == 0.6
    assert r["precision_score"] == _round4(2 / 3)
    assert r["recall_score"] == _round4(2 / 3)
    assert r["f1"] == _round4(4 / 6)


def test_multi_touch_attribution_credit_split(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mt"))

    def ev(eid, uid, typ, secs):
        return (eid, T0 + dt.timedelta(seconds=secs), uid, typ, 1.0, "{}")

    rows = [
        # user 1: two clicks then a purchase -> split 50/50
        ev(1, 1, "click", 0),
        ev(2, 1, "click", 10),
        ev(3, 1, "purchase", 20),
        # user 2: purchase with no preceding click -> unattributed
        ev(4, 2, "purchase", 0),
        # user 3: three clicks then a purchase -> floor(10000/3)
        ev(5, 3, "click", 0),
        ev(6, 3, "click", 10),
        ev(7, 3, "click", 20),
        ev(8, 3, "purchase", 30),
        # user 3 buys again with no new click: same touch set
        ev(9, 3, "purchase", 40),
    ]
    _write(
        spark, out, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["purchase_id"]: r
        for r in QS["attribution_multi_touch"](spark, out).collect()
    }
    assert set(got) == {3, 4, 8, 9}
    r3 = got[3]
    assert (r3["n_touches"], r3["first_click_id"], r3["last_click_id"]) == (
        2, 1, 2,
    )
    assert r3["credit_bp"] == 5000
    r4 = got[4]
    assert r4["n_touches"] == 0
    assert r4["first_click_id"] is None and r4["last_click_id"] is None
    assert r4["credit_bp"] is None
    assert got[8]["credit_bp"] == 3333
    assert got[9]["n_touches"] == 3 and got[9]["last_click_id"] == 7


def test_popularity_decay_halves_per_30_day_bucket(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("decay"))
    maxd = dt.date(2024, 3, 1)

    orders = [
        (1, 1, "O", 100.0, maxd, "1-URGENT"),
        (2, 1, "O", 100.0, maxd - dt.timedelta(days=45), "1-URGENT"),
        (3, 1, "O", 100.0, maxd - dt.timedelta(days=75), "1-URGENT"),
        (4, 1, "O", 100.0, maxd - dt.timedelta(days=3000), "1-URGENT"),
    ]
    # item 100 fresh, item 200 aged, item 300 ancient (weight -> 0)
    li = [
        (1, 100, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", maxd),
        (2, 200, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", maxd),
        (3, 200, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", maxd),
        (4, 300, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", maxd),
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    got = {
        r["item"]: r
        for r in QS["rec_popularity_time_decay"](spark, out).collect()
    }
    # item 100: bucket 0 -> 10000; item 200: buckets 1 + 2 -> 5000+2500;
    # item 300: bucket 100 -> floor(10000/2^100) = 0
    assert got[100]["decayed_bp"] == 10000
    assert got[200]["decayed_bp"] == 7500 and got[200]["n_ratings"] == 2
    assert got[300]["decayed_bp"] == 0
    # recency beats raw count: item 100 (1 rating) outranks item 200 (2)
    order = [r["item"] for r in
             QS["rec_popularity_time_decay"](spark, out).collect()]
    assert order.index(100) < order.index(200)


def test_seasonal_baseline_weekday_zscore(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("seas"))
    monday0 = dt.date(2024, 1, 1)  # a Monday -> weekday 0
    orders = [
        (k, 1, "O", 100.0, monday0 + dt.timedelta(days=7 * k), "1-URGENT")
        for k in range(9)
    ]
    # the tenth Monday is the outlier: nine 100s and one 200
    orders.append(
        (9, 1, "O", 200.0, monday0 + dt.timedelta(days=70), "1-URGENT")
    )
    # one lone Tuesday: stddev undefined -> z NULL, flag NULL
    orders.append((10, 1, "O", 100.0, dt.date(2024, 1, 2), "1-URGENT"))
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    rows = QS["timeseries_seasonal_baseline"](spark, out).collect()
    by_day = {r["day"]: r for r in rows}
    outlier = by_day[monday0 + dt.timedelta(days=70)]
    assert outlier["weekday"] == 0
    # Mondays: nine 100s and one 200 -> mu=110, sd=sqrt(1000)
    assert outlier["wd_avg"] == 110.0
    assert outlier["z"] == _round4(90 / math.sqrt(1000))
    assert outlier["is_anomaly"] is True
    normal = by_day[monday0]
    assert normal["is_anomaly"] is False
    tuesday = by_day[dt.date(2024, 1, 2)]
    assert tuesday["weekday"] == 1
    assert tuesday["z"] is None and tuesday["is_anomaly"] is None


def _wilson(pos: int, n: int):
    p = pos / n
    half = 1.96 * math.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
    denom = 1 + 3.8416 / n
    return (
        _round4((p + 1.9208 / n - half) / denom),
        _round4((p + 1.9208 / n + half) / denom),
    )


def test_wilson_ci_closed_form_and_zero_p(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wilson"))
    cust = [
        # nation 1: 1 of 4 above the bar
        (1, "a", 1, 9000.0, "AUTO"),
        (2, "b", 1, 100.0, "AUTO"),
        (3, "c", 1, 100.0, "AUTO"),
        (4, "d", 1, 100.0, "AUTO"),
        # nation 2: 0 of 3 -> Wilson lower bound collapses to 0,
        # upper stays > 0 (the Wald interval would be [0, 0])
        (5, "e", 2, 100.0, "AUTO"),
        (6, "f", 2, 100.0, "AUTO"),
        (7, "g", 2, 100.0, "AUTO"),
    ]
    _write(
        spark, out, "customer", cust,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    got = {r["nationkey"]: r for r in QS["stats_wilson_ci"](spark, out).collect()}
    r1 = got[1]
    lo, hi = _wilson(1, 4)
    assert (r1["n"], r1["pos"], r1["p_hat"]) == (4, 1, 0.25)
    assert (r1["ci_lo"], r1["ci_hi"]) == (lo, hi)
    r2 = got[2]
    lo2, hi2 = _wilson(0, 3)
    assert r2["ci_lo"] == lo2 == 0.0
    assert r2["ci_hi"] == hi2 > 0.5


def test_key_candidates_uniqueness_profile(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("keys"))
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    orders = [
        (1, 1, "O", 10.0, d1, "1-URGENT"),
        (2, 1, "O", 10.0, d1, "1-URGENT"),  # composite dup with row 1
        (3, 2, "O", 10.0, d1, "1-URGENT"),
        (4, 2, "O", 10.0, d2, "1-URGENT"),
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    got = {
        r["candidate"]: r
        for r in QS["quality_key_candidates"](spark, out).collect()
    }
    pk = got["o_orderkey"]
    assert pk["n_distinct"] == 4 and pk["is_key"] is True
    assert pk["uniqueness"] == 1.0
    fk = got["o_custkey"]
    assert (fk["n_distinct"], fk["uniqueness"], fk["is_key"]) == (2, 0.5, False)
    comp = got["o_custkey|o_orderdate"]
    assert (comp["n_distinct"], comp["uniqueness"], comp["is_key"]) == (
        3, 0.75, False,
    )
