"""Crafted-input tests for the round-5 batch-22 keys: ABC Pareto
classification, leakage-free training snapshots, and additive series
decomposition.
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


def test_abc_classes_at_exact_boundaries(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("abc"))
    d = dt.date(2024, 1, 1)
    li = [
        (1, 10, 1, 1, 1.0, 80.0, 0.0, 0.0, "N", "O", d),
        (2, 20, 1, 1, 1.0, 15.0, 0.0, 0.0, "N", "O", d),
        (3, 30, 1, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", d),
    ]
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    got = {r["l_partkey"]: r for r in
           QS["tpch_abc_classification"](spark, out).collect()}
    # cum shares 0.8 / 0.95 / 1.0 land exactly ON the class boundaries
    assert (got[10]["cum_share"], got[10]["abc_class"]) == (0.8, "A")
    assert (got[20]["cum_share"], got[20]["abc_class"]) == (0.95, "B")
    assert (got[30]["cum_share"], got[30]["abc_class"]) == (1.0, "C")


def test_training_snapshot_is_leakage_free(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snap"))

    def ev(eid, uid, typ, secs, value=1.0):
        return (eid, T0 + dt.timedelta(seconds=secs), uid, typ, value, "{}")

    rows = [
        # u1: two clicks then two purchases
        ev(1, 1, "click", 0),
        ev(2, 1, "click", 100),
        ev(3, 1, "purchase", 200, 50.0),
        ev(4, 1, "purchase", 300, 70.0),
        # u2: click and purchase in the SAME second — strictly-prior
        # frames must exclude the co-timestamped click
        ev(5, 2, "click", 1000),
        ev(6, 2, "purchase", 1000, 10.0),
        # u3: click 8 days before the purchase — outside the 7-day
        # window but still a lifetime prior event
        ev(7, 3, "click", 0),
        ev(8, 3, "purchase", 8 * 86400, 10.0),
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    got = {r["purchase_id"]: r for r in
           QS["ml_training_snapshot"](spark, out).collect()}
    p3 = got[3]
    assert (p3["clicks_7d"], p3["spend_7d"], p3["prior_events"]) == (
        2, 0.0, 2,
    )
    p4 = got[4]
    # the purchase at 200 is prior spend for the purchase at 300
    assert (p4["clicks_7d"], p4["spend_7d"], p4["prior_events"]) == (
        2, 50.0, 3,
    )
    p6 = got[6]
    assert (p6["clicks_7d"], p6["spend_7d"], p6["prior_events"]) == (
        0, 0.0, 0,
    )
    p8 = got[8]
    assert (p8["clicks_7d"], p8["spend_7d"], p8["prior_events"]) == (
        0, 0.0, 1,
    )


def test_decompose_constant_series_is_pure_trend(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("decomp"))
    monday0 = dt.date(2024, 1, 1)
    orders = [
        (k, 1, "O", 100.0, monday0 + dt.timedelta(days=k), "1-URGENT")
        for k in range(14)
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    rows = QS["timeseries_decompose_additive"](spark, out).collect()
    assert len(rows) == 14
    for r in rows:
        assert r["trend"] == 100.0       # partial edge frames too
        assert r["seasonal"] == 0.0
        assert r["residual"] == 0.0
    wd = {r["day"]: r["weekday"] for r in rows}
    assert wd[monday0] == 0 and wd[monday0 + dt.timedelta(days=6)] == 6


def test_cold_start_backfill_targets_lapsed_users_only(
    spark, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("cold"))
    d97, d98 = dt.date(1997, 6, 1), dt.date(1998, 3, 1)
    orders = [
        (1, 1, "O", 10.0, d98, "1-URGENT"),   # active in 1998
        (2, 2, "O", 10.0, d97, "1-URGENT"),   # lapsed
        (3, 2, "O", 10.0, d97, "1-URGENT"),
    ]
    li = [
        # item 10 x3, item 20 x2, item 30 x1, item 40 x1
        (1, 10, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d98),
        (1, 10, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d98),
        (2, 10, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d97),
        (2, 20, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d97),
        (3, 20, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d97),
        (3, 30, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d97),
        (3, 40, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", d97),
    ]
    cust = [(1, "a", 1, 0.0, "AUTO"), (2, "b", 1, 0.0, "AUTO"),
            (3, "c", 1, 0.0, "AUTO")]  # cust 3 never ordered at all
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    _write(
        spark, out, "customer", cust,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    rows = QS["rec_cold_start_backfill"](spark, out).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user"], []).append((r["rank"], r["rec_item"]))
    assert set(by_user) == {2, 3}  # user 1 is active, not backfilled
    for recs in by_user.values():
        # top 3 by count desc, item asc: 10 (3), 20 (2), 30 (1, ties 40
        # broken by item asc)
        assert sorted(recs) == [(1, 10), (2, 20), (3, 30)]


def test_full_outer_using_one_sided_days(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fou"))

    def ev(eid, typ, days, value=1.0):
        return (eid, T0 + dt.timedelta(days=days), 1, typ, value, "{}")

    rows = [
        ev(1, "click", 0),                     # day with clicks only
        ev(2, "click", 1), ev(3, "purchase", 1, 200.0),  # both sides
        ev(4, "purchase", 2, 200.0),           # high-value only
        ev(5, "purchase", 3, 50.0),            # low-value: NO side
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    got = {r["day"]: r for r in
           QS["join_full_outer_using"](spark, out).collect()}
    base = min(got)  # epoch-day of T0
    d0, d1, d2 = got[base], got[base + 1], got[base + 2]
    assert base + 3 not in got  # low-value-only day joins neither side
    assert (d0["n_clicks"], d0["n_purchases"]) == (1, 0)
    assert d0["purchase_side_missing"] is True
    assert d1["click_side_missing"] is False
    assert d1["purchase_side_missing"] is False
    assert (d2["n_clicks"], d2["n_purchases"]) == (0, 1)
    assert d2["click_side_missing"] is True
    # the USING-coalesced day column is non-NULL on every row
    assert all(r["day"] is not None for r in got.values())


def test_embedding_audit_flags_zero_and_bad_dim(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("eaudit"))
    vecs = [
        (1, [3.0, 4.0] + [0.0] * 62, 1),   # norm 5
        (2, [0.0] * 64, 1),                # zero vector
        (3, [1.0, 2.0, 2.0], 2),           # wrong dimension, norm 3
    ]
    _write(
        spark, out, "embeddings", vecs,
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["label"]: r for r in
           QS["quality_embedding_audit"](spark, out).collect()}
    l1 = got[1]
    assert (l1["n"], l1["n_bad_dim"], l1["n_zero_vectors"]) == (2, 0, 1)
    assert (l1["min_norm"], l1["max_norm"], l1["avg_norm"]) == (0.0, 5.0, 2.5)
    l2 = got[2]
    assert (l2["n"], l2["n_bad_dim"], l2["n_zero_vectors"]) == (1, 1, 0)
    assert l2["min_norm"] == 3.0


def test_cogrouped_map_handles_one_sided_users(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cog"))

    def ev(eid, uid, typ, secs):
        return (eid, T0 + dt.timedelta(seconds=secs), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "click", 0), ev(2, 1, "click", 60),
        ev(3, 1, "purchase", 120),
        ev(4, 2, "click", 0),          # clicks only
        ev(5, 3, "purchase", 0),       # purchases only
        ev(6, 4, "view", 0),           # neither side: absent entirely
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    got = {r["user_id"]: r for r in
           QS["udf_cogrouped_map"](spark, out).collect()}
    assert set(got) == {1, 2, 3}
    t0 = int(T0.timestamp())
    r1 = got[1]
    assert (r1["n_clicks"], r1["n_purchases"]) == (2, 1)
    assert r1["last_click_sec"] == t0 + 60
    assert r1["last_purchase_sec"] == t0 + 120
    r2 = got[2]
    assert (r2["n_clicks"], r2["n_purchases"]) == (1, 0)
    assert r2["last_purchase_sec"] is None
    r3 = got[3]
    assert (r3["n_clicks"], r3["n_purchases"]) == (0, 1)
    assert r3["last_click_sec"] is None


def test_cogrouped_map_survives_subplan_reuse_at_scale(spark):
    """Regression for the round-7 sf0.1 crash: with both cogroup
    inputs derived from ONE shared parent DataFrame, Spark's subplan
    reuse could serve both Arrow streams from a single pruned
    projection, delivering group frames WITHOUT the non-key column
    (KeyError 'sec' inside the merge). The key now builds each side
    from an independent read; this runs the real fixture at sf0.1 —
    the regime where the reuse kicked in (sf0.001/sf0.01 never
    triggered it)."""
    from tests.conftest import SF_TENTH

    got = QS["udf_cogrouped_map"](spark, SF_TENTH)
    n = got.count()
    assert n > 0
    one = got.limit(5).collect()
    assert {"n_clicks", "n_purchases"} <= set(one[0].asDict())


def test_control_chart_flags_shifted_day(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pchart"))
    rows = []
    eid = 0
    # 9 in-control days: 100 events, 10 errors (p = 0.1)
    for day in range(9):
        for k in range(100):
            eid += 1
            typ = "error" if k < 10 else "click"
            rows.append((eid, T0 + dt.timedelta(days=day, seconds=k),
                         1, typ, 1.0, "{}"))
    # the shifted day: 100 events, 40 errors
    for k in range(100):
        eid += 1
        typ = "error" if k < 40 else "click"
        rows.append((eid, T0 + dt.timedelta(days=9, seconds=k),
                     1, typ, 1.0, "{}"))
    _write(spark, out, "events", rows, _EV_SCHEMA)
    got = {r["day"]: r for r in
           QS["quality_control_chart"](spark, out).collect()}
    assert len(got) == 10
    # pbar = 130/1000 = 0.13; sigma = sqrt(.13*.87/100) = 0.0336 ->
    # UCL ~ 0.231: day 9 (p = 0.4) is out, p = 0.1 days are in
    shifted = [d for d, r in got.items() if r["out_of_control"]]
    assert len(shifted) == 1
    assert got[shifted[0]]["p"] == 0.4
    normal = [r for d, r in got.items() if d != shifted[0]]
    assert all(r["p"] == 0.1 for r in normal)
    assert all(r["lcl"] <= 0.1 <= r["ucl"] for r in normal)


def test_anova_closed_form_two_groups(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("anova"))
    d = dt.date(2024, 1, 1)
    vals = {"1-URGENT": [1.0, 2.0, 3.0], "2-HIGH": [4.0, 5.0, 6.0]}
    orders, k = [], 0
    for prio, vs in vals.items():
        for v in vs:
            k += 1
            orders.append((k, 1, "O", v, d, prio))
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    r = QS["stats_anova_oneway"](spark, out).collect()[0]
    # means 2 and 5, grand 3.5: SSB = 3(1.5²)·2 = 13.5, SSW = 2+2 = 4,
    # F = (13.5/1)/(4/4) = 13.5
    assert (r["k"], r["n"], r["df1"], r["df2"]) == (2, 6, 1, 4)
    # MSB = 13.5/1, MSW = 4/4 (mean squares, not raw SS — see the
    # round4 saturation note in functions/rounding.py)
    assert (r["ms_between"], r["ms_within"], r["f_stat"]) == (
        13.5, 1.0, 13.5,
    )


def test_llr_zero_at_independence(spark, tmp_path_factory):
    # two-word docs: each doc contributes exactly one bigram. The
    # {a,d}x{b,c} product corpus is EXACTLY independent (every cell
    # equals its expectation), so every LLR is exactly 0.
    out = str(tmp_path_factory.mktemp("llr0"))
    docs, k = [], 0
    for pair in [("a", "b"), ("a", "c"), ("d", "b"), ("d", "c")]:
        for _ in range(5):
            k += 1
            docs.append((k, f"{pair[0]} {pair[1]}", "en", "s", 3))
    _write(
        spark, out, "documents", docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    rows = QS["text_collocation_llr"](spark, out).collect()
    assert len(rows) == 4
    assert all(r["llr"] == 0.0 for r in rows)


def test_llr_ranks_exclusive_pair_first(spark, tmp_path_factory):
    import math

    out = str(tmp_path_factory.mktemp("llr1"))
    # (x,y) x10 exclusive pair vs (p,q) x5 background:
    # N=15, k11=10, r1=c1=10, k22=5 ->
    # LLR = 2(10 ln 1.5 + 5 ln 3)
    docs, k = [], 0
    for pair, cnt in [(("x", "y"), 10), (("p", "q"), 5)]:
        for _ in range(cnt):
            k += 1
            docs.append((k, f"{pair[0]} {pair[1]}", "en", "s", 3))
    _write(
        spark, out, "documents", docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    rows = QS["text_collocation_llr"](spark, out).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    want = math.floor(
        2 * (10 * math.log(1.5) + 5 * math.log(3.0)) * 10000 + 0.5
    ) / 10000
    assert got[("x", "y")]["llr"] == want
    # in a two-pair world each pair perfectly predicts the other, so
    # (p,q) scores the SAME G² (2(5 ln 3 + 10 ln 1.5) — symmetric) and
    # the deterministic tie-break puts it first
    assert got[("p", "q")]["llr"] == want
    assert (rows[0]["w1"], rows[0]["w2"]) == ("p", "q")


def test_zipf_perfect_power_law(spark, tmp_path_factory):
    import math

    out = str(tmp_path_factory.mktemp("zipf"))
    # freq(rank r) = 12/r exactly: log-log slope -1, r2 = 1
    freqs = {"aa": 12, "bb": 6, "cc": 4, "dd": 3}
    docs = [
        (i + 1, " ".join([w] * n), "en", "s", 1)
        for i, (w, n) in enumerate(freqs.items())
    ]
    _write(
        spark, out, "documents", docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    r = QS["text_zipf_fit"](spark, out).collect()[0]
    assert r["n_words"] == 4
    assert r["slope"] == -1.0
    assert r["r2"] == 1.0
    assert r["intercept"] == math.floor(math.log(12) * 10000 + 0.5) / 10000


def test_user_overlap_jaccard_pairs(spark, tmp_path_factory):
    import math

    out = str(tmp_path_factory.mktemp("jac"))

    def ev(eid, uid, typ):
        return (eid, T0, uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "a"), ev(2, 1, "b"),
        ev(3, 2, "a"), ev(4, 2, "c"),
        ev(5, 3, "b"),
        ev(6, 4, "a"), ev(7, 4, "b"),
        ev(8, 4, "a"),  # duplicate membership must not double-count
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    got = {(r["t1"], r["t2"]): r for r in
           QS["events_user_overlap_jaccard"](spark, out).collect()}
    ab = got[("a", "b")]
    # A = {1,2,4}, B = {1,3,4}, both = {1,4} -> 2/4
    assert (ab["n1"], ab["n2"], ab["n_both"], ab["jaccard"]) == (
        3, 3, 2, 0.5,
    )
    ac = got[("a", "c")]
    assert (ac["n_both"], ac["jaccard"]) == (1, math.floor(
        1 / 3 * 10000 + 0.5) / 10000)
    # zero-overlap pairs are absent, not zero rows
    assert ("b", "c") not in got


def test_binary_encoding_roundtrip_and_byte_length(
    spark, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("b64"))
    docs = [
        (1, "hello", "en", "s", 5),
        (2, "café", "fr", "s", 4),  # é: 2 UTF-8 bytes
    ]
    _write(
        spark, out, "documents", docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = {r["doc_id"]: r for r in
           QS["fn_binary_encoding"](spark, out).collect()}
    r1 = got[1]
    assert r1["b64"] == "aGVsbG8="
    assert r1["hx"] == "68656C6C6F"
    assert r1["roundtrip_ok"] is True
    assert r1["n_bytes"] == 5
    r2 = got[2]
    # 4 characters but 5 bytes: the char-vs-byte length divergence
    assert r2["n_bytes"] == 5
    assert r2["roundtrip_ok"] is True


def test_yoy_growth_flags_and_null_ratio(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("yoy"))
    d97, d98 = dt.date(1997, 6, 1), dt.date(1998, 6, 1)
    orders = [
        # cust 1: 100 -> 250: doubled
        (1, 1, "O", 100.0, d97, "1-URGENT"),
        (2, 1, "O", 250.0, d98, "1-URGENT"),
        # cust 2: 100 -> 150: grew but not doubled
        (3, 2, "O", 100.0, d97, "1-URGENT"),
        (4, 2, "O", 150.0, d98, "1-URGENT"),
        # cust 3: new in 98: NULL ratio, never "doubled"
        (5, 3, "O", 500.0, d98, "1-URGENT"),
        # cust 4: only pre-97 activity: absent from the report
        (6, 4, "O", 100.0, dt.date(1996, 6, 1), "1-URGENT"),
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    got = {r["custkey"]: r for r in
           QS["tpch_yoy_customer_growth"](spark, out).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["doubled"] is True and got[1]["growth_ratio"] == 2.5
    assert got[2]["doubled"] is False and got[2]["growth_ratio"] == 1.5
    assert got[3]["growth_ratio"] is None and got[3]["doubled"] is False


def test_share_of_parent_hierarchy(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sop"))
    d = dt.date(2024, 1, 1)
    # region R1 = {N1: 60, N2: 40}, region R2 = {N3: 100}
    orders = [
        (1, 1, "O", 60.0, d, "1-URGENT"),
        (2, 2, "O", 40.0, d, "1-URGENT"),
        (3, 3, "O", 100.0, d, "1-URGENT"),
    ]
    cust = [(1, "a", 1, 0.0, "AUTO"), (2, "b", 2, 0.0, "AUTO"),
            (3, "c", 3, 0.0, "AUTO")]
    nation = [(1, "N1", 1), (2, "N2", 1), (3, "N3", 2)]
    region = [(1, "R1"), (2, "R2")]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    _write(
        spark, out, "customer", cust,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    _write(spark, out, "nation", nation,
           "n_nationkey long, n_name string, n_regionkey long")
    _write(spark, out, "region", region,
           "r_regionkey long, r_name string")
    got = {r["nation"]: r for r in
           QS["agg_share_of_parent"](spark, out).collect()}
    assert got["N1"]["share_in_region"] == 0.6
    assert got["N2"]["share_in_region"] == 0.4
    assert got["N3"]["share_in_region"] == 1.0
    assert got["N1"]["region_share_of_total"] == 0.5
    assert got["N3"]["region_share_of_total"] == 0.5


def test_null_ordering_heads(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nullord"))
    d = dt.date(2024, 1, 1)
    # keys 7, 14, 21 -> NULL val; others val = 10*key
    orders = [
        (k, 1, "O", float(10 * k), d, "1-URGENT")
        for k in range(1, 22)
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    rows = QS["sort_null_ordering"](spark, out).collect()
    first = sorted(
        (r["o_orderkey"] for r in rows if r["mode"] == "nulls_first")
    )
    last = sorted(
        (r["o_orderkey"] for r in rows if r["mode"] == "nulls_last")
    )
    # NULLS FIRST head: the 3 NULL rows (7,14,21), then minima 1,2
    assert first == [1, 2, 7, 14, 21]
    # NULLS LAST head: the 5 smallest non-NULL values
    assert last == [1, 2, 3, 4, 5]
    nulls = {r["o_orderkey"] for r in rows if r["val"] is None}
    assert nulls == {7, 14, 21}


def test_asof_tolerance_matches_and_nulls(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("asoftol"))
    # orderkey 100 -> cutoff 2024-01-17 00:00, u_key = custkey % 150
    # orderkey 200 -> cutoff 2024-01-19 00:00
    orders = [
        (100, 7, "O", 10.0, dt.date(2024, 1, 1), "1-URGENT"),
        (200, 8, "O", 10.0, dt.date(2024, 1, 1), "1-URGENT"),
    ]
    c17 = dt.datetime(2024, 1, 17, 0, 0, 0)
    c19 = dt.datetime(2024, 1, 19, 0, 0, 0)
    events = [
        # user 7: two in-window events -> the later one wins; one
        # post-cutoff event must be ignored
        (1, c17 - dt.timedelta(hours=5), 7, "click", 1.0, "{}"),
        (2, c17 - dt.timedelta(hours=3), 7, "click", 1.0, "{}"),
        (3, c17 + dt.timedelta(hours=1), 7, "click", 1.0, "{}"),
        # user 8: only a stale event 10h before -> outside tolerance
        (4, c19 - dt.timedelta(hours=10), 8, "click", 1.0, "{}"),
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    _write(spark, out, "events", events, _EV_SCHEMA)
    got = {r["o_orderkey"]: r for r in
           QS["join_asof_tolerance"](spark, out).collect()}
    assert got[100]["event_id"] == 2
    assert got[100]["gap_s"] == 3 * 3600
    assert got[200]["event_id"] is None and got[200]["gap_s"] is None


def test_peak_concurrency_sweep_and_midnight_clip(
    spark, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("conc"))

    def ev(eid, uid, hh, mm, day=0):
        return (
            eid,
            T0 + dt.timedelta(days=day, hours=hh, minutes=mm),
            uid, "click", 1.0, "{}",
        )

    rows = [
        # user 1: session 10:00-11:00 (events every 20 min)
        ev(1, 1, 10, 0), ev(2, 1, 10, 20), ev(3, 1, 10, 40),
        ev(4, 1, 11, 0),
        # user 2: session 10:30-11:30 -> overlaps user 1
        ev(5, 2, 10, 30), ev(6, 2, 11, 0), ev(7, 2, 11, 30),
        # user 3: session 23:30 day0 - 00:30 day1 (crosses midnight)
        ev(8, 3, 23, 30), ev(9, 3, 23, 50),
        ev(10, 3, 0, 10, day=1), ev(11, 3, 0, 30, day=1),
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    got = {r["day"]: r for r in
           QS["events_peak_concurrency"](spark, out).collect()}
    base = min(got)
    d0, d1 = got[base], got[base + 1]
    # day 0: three session segments; users 1+2 overlap 10:30-11:00
    assert (d0["n_sessions"], d0["peak_concurrency"]) == (3, 2)
    # day 1: only user 3's clipped tail
    assert (d1["n_sessions"], d1["peak_concurrency"]) == (1, 1)


def test_masked_view_hides_and_filters(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mview"))
    cust = [
        (1, "Customer#000000001", 1, 100.0, "AUTO"),
        (2, "Customer#000000002", 1, -5.0, "AUTO"),  # filtered out
    ]
    _write(
        spark, out, "customer", cust,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    rows = QS["sql_view_masked"](spark, out).collect()
    assert [r["c_custkey"] for r in rows] == [1]
    assert rows[0]["masked_name"] == "Customer#***"
    # the raw name must not be reachable through the view's schema
    assert "c_name" not in rows[0].asDict()


def test_parameterized_binding_equals_inlined(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("psql"))
    orders = [
        (1, 1, "O", 300000.0, dt.date(1997, 1, 1), "1-URGENT"),  # in
        (2, 1, "O", 100000.0, dt.date(1997, 1, 1), "1-URGENT"),  # low
        (3, 1, "O", 300000.0, dt.date(1995, 1, 1), "1-URGENT"),  # old
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    rows = QS["sql_parameterized"](spark, out).collect()
    assert len(rows) == 1
    assert (rows[0]["n"], rows[0]["total"]) == (1, 300000.0)


def test_theil_zero_on_equality_and_positive_on_concentration(
    spark, tmp_path_factory
):
    import math

    out = str(tmp_path_factory.mktemp("theil"))
    cust = [
        # nation 1: perfectly equal -> T = 0 exactly
        (1, "a", 1, 100.0, "AUTO"),
        (2, "b", 1, 100.0, "AUTO"),
        (3, "c", 1, 100.0, "AUTO"),
        # nation 2: one holder of 300 vs 100 -> closed form
        (4, "d", 2, 300.0, "AUTO"),
        (5, "e", 2, 100.0, "AUTO"),
        # nation 3: negatives excluded, then only one row -> dropped
        (6, "f", 3, 100.0, "AUTO"),
        (7, "g", 3, -50.0, "AUTO"),
    ]
    _write(
        spark, out, "customer", cust,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    got = {r["nationkey"]: r for r in
           QS["stats_theil_index"](spark, out).collect()}
    assert got[1]["theil_t"] == 0.0
    # T = (300 ln 300 + 100 ln 100)/400 - ln 200
    want = (300 * math.log(300) + 100 * math.log(100)) / 400 - math.log(200)
    assert got[2]["theil_t"] == math.floor(want * 10000 + 0.5) / 10000
    assert 3 not in got  # single positive row: dropped by n >= 2


def test_fk_matrix_counts_planted_orphans(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fkm"))
    d = dt.date(2024, 1, 1)
    region = [(1, "R1")]
    nation = [(1, "N1", 1), (2, "N2", 99)]     # N2 -> missing region
    cust = [(1, "a", 1, 0.0, "AUTO"), (2, "b", 77, 0.0, "AUTO")]
    supplier = [(1, "s", 1, 0.0)]
    part = [(1, "widget", "B", "T", 1, 1.0)]
    orders = [(1, 1, "O", 1.0, d, "1-URGENT"),
              (2, 999, "O", 1.0, d, "1-URGENT")]  # orphan custkey
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (77, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),  # orphan order
        (1, 88, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d),  # orphan part
    ]
    _write(spark, out, "region", region, "r_regionkey long, r_name string")
    _write(spark, out, "nation", nation,
           "n_nationkey long, n_name string, n_regionkey long")
    _write(spark, out, "customer", cust,
           "c_custkey long, c_name string, c_nationkey long, "
           "c_acctbal double, c_mktsegment string")
    _write(spark, out, "supplier", supplier,
           "s_suppkey long, s_name string, s_nationkey long, "
           "s_acctbal double")
    _write(spark, out, "part", part,
           "p_partkey long, p_name string, p_brand string, "
           "p_type string, p_size int, p_retailprice double")
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    got = {r["fk"]: r for r in QS["quality_fk_matrix"](spark, out).collect()}
    assert len(got) == 7
    assert got["orders.o_custkey->customer"]["n_orphans"] == 1
    assert got["lineitem.l_orderkey->orders"]["n_orphans"] == 1
    assert got["lineitem.l_partkey->part"]["n_orphans"] == 1
    assert got["lineitem.l_suppkey->supplier"]["n_orphans"] == 0
    assert got["customer.c_nationkey->nation"]["n_orphans"] == 1
    assert got["nation.n_regionkey->region"]["n_orphans"] == 1
    assert got["supplier.s_nationkey->nation"]["n_orphans"] == 0
    assert got["lineitem.l_orderkey->orders"]["n_rows"] == 3
