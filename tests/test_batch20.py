"""Crafted-input tests for the round-5 batch-20 keys: the exact-oracle
Lloyd iteration and rule-based bot detection.
"""

from __future__ import annotations

import datetime as dt
import math

from movierecommender_sentimentanalysissytem_spark import registry

QS = registry.queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


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
