"""Crafted-input tests for the round-7 evaluation/curation batch:
NDCG ranking quality, BH false-discovery control, calibration bins,
the learning curve, soft-dedup token weights, and the distance-metric
family. Each fixture is built so the expected output is known by
construction (hand-computable), independent of the DuckDB oracle."""

from __future__ import annotations

import math

from movierecommender_sentimentanalysissytem_spark import registry

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

_PART_SCHEMA = "p_partkey long, p_name string, p_brand string, p_type string"

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_EMB_SCHEMA = "vec_id long, embedding array<float>, label long"


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


import datetime as dt

_D = dt.date(2024, 1, 1)


def _li(ok, item, qty=1.0, user_line=1):
    return (ok, item, 1, user_line, qty, 100.0, 0.0, 0.0, "N", "O", _D)


def _order(ok, user):
    return (ok, user, "O", 100.0, _D, "1-URGENT")


def test_ndcg_rank1_vs_rank_miss(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ndcg"))
    # train (ok % 4 != 0): item 1 cnt 3, item 2 cnt 2, item 3 cnt 1
    li = (
        [_li(1, 1), _li(2, 1), _li(3, 1)]
        + [_li(1, 2), _li(2, 2)]
        + [_li(1, 3)]
        # test (ok % 4 == 0): user 100 holds item 1 (rank 1);
        # user 200 holds items 3 (rank 3) and 4 (never in train)
        + [_li(4, 1), _li(8, 3), _li(8, 4)]
    )
    orders = [
        _order(1, 900),
        _order(2, 900),
        _order(3, 900),
        _order(4, 100),
        _order(8, 200),
    ]
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    got = {r["user"]: r for r in QS["rec_eval_ndcg_at_k"](spark, out).collect()}
    # user 100: single relevant item at rank 1 → perfect NDCG
    assert got[100]["hits"] == 1
    assert got[100]["ndcg_at_10"] == 1.0
    # user 200: hit at rank 3 (gain 1/log2(4) = 0.5), one miss;
    # ideal DCG for 2 relevants = 1 + 1/log2(3)
    idcg = 1.0 + 1.0 / math.log2(3)
    assert got[200]["n_relevant"] == 2
    assert got[200]["hits"] == 1
    assert got[200]["ndcg_at_10"] == _round4(0.5 / idcg)


def test_fdr_bh_step_up(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bh"))
    # brand BX: even-orderkey half all q=1, odd half all q=50 → D = 1;
    # brands BY, BZ: identical halves → D = 0 → p clamps at 1.0
    li, parts = [], [(1, "p1", "BX", "t"), (2, "p2", "BY", "t"), (3, "p3", "BZ", "t")]
    for i in range(10):
        li.append(_li(2 * i, 1, qty=1.0))
        li.append(_li(2 * i + 1, 1, qty=50.0))
        for pk in (2, 3):
            li.append(_li(2 * i, pk, qty=5.0))
            li.append(_li(2 * i + 1, pk, qty=5.0))
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    _write(spark, out, "part", parts, _PART_SCHEMA)
    got = {r["brand"]: r for r in QS["stats_fdr_bh"](spark, out).collect()}
    assert got["BX"]["d_stat"] == 1.0 and got["BX"]["rk"] == 1
    # p = 2·exp(−2·1·(10·10/20)) = 2e^{-10}; p_adj = p·3/1
    p = 2 * math.exp(-10)
    assert got["BX"]["p_value"] == _round4(p)
    assert got["BX"]["p_adj"] == _round4(3 * p)
    assert got["BX"]["reject"] is True
    # null brands: p = 1 exactly, brand tie-break orders BY before BZ,
    # and the step-up keeps both adjusted p at 1 — no rejection
    assert (got["BY"]["rk"], got["BZ"]["rk"]) == (2, 3)
    for b in ("BY", "BZ"):
        assert got[b]["p_value"] == 1.0
        assert got[b]["p_adj"] == 1.0
        assert got[b]["reject"] is False


def test_calibration_bins_exact(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("calib"))
    li = [
        # q=1 → score 0 → bin 0; both negative (price ≤ 30000)
        _li(1, 1, qty=1.0),
        _li(2, 1, qty=1.0),
        # q=25 → score 24/49 → bin 4; one positive, one negative
        (3, 1, 1, 1, 25.0, 40000.0, 0.0, 0.0, "N", "O", _D),
        (4, 1, 1, 1, 25.0, 100.0, 0.0, 0.0, "N", "O", _D),
        # q=50 → score 1.0 → bin 9 (capped); positive
        (5, 1, 1, 1, 50.0, 90000.0, 0.0, 0.0, "N", "O", _D),
    ]
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    got = {r["bin"]: r for r in QS["ml_calibration_bins"](spark, out).collect()}
    assert set(got) == {0, 4, 9}
    assert got[0]["n"] == 2 and got[0]["pos_rate"] == 0.0
    assert got[0]["mean_score"] == 0.0
    assert got[4]["pos_rate"] == 0.5
    assert got[4]["mean_score"] == _round4(24 / 49)
    assert got[4]["gap"] == _round4(0.5 - 24 / 49)
    assert got[9]["n"] == 1 and got[9]["pos_rate"] == 1.0
    assert got[9]["mean_score"] == 1.0 and got[9]["gap"] == 0.0


def test_learning_curve_improves_with_data(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lc"))
    # item 1 rated 30 in fold 0, then 10 in folds 1 and 2; the test
    # fold (3) rates it 10 → prediction error shrinks as folds accrue
    li = [
        _li(4, 1, qty=30.0),  # fold 0
        _li(5, 1, qty=10.0),  # fold 1
        _li(6, 1, qty=10.0),  # fold 2
        _li(7, 1, qty=10.0),  # fold 3 (test)
    ]
    orders = [_order(k, 1) for k in (4, 5, 6, 7)]
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    got = {r["frac"]: r for r in QS["ml_learning_curve"](spark, out).collect()}
    assert [got[f]["n_test"] for f in (1, 2, 3)] == [1, 1, 1]
    assert got[1]["rmse"] == 20.0          # pred 30 vs 10
    assert got[2]["rmse"] == 10.0          # pred (30+10)/2
    assert got[3]["rmse"] == _round4(50 / 3 - 10)  # pred 50/3
    assert got[1]["rmse"] > got[2]["rmse"] > got[3]["rmse"]


def test_learning_curve_unseen_item_falls_back_to_global_mean(
    spark, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("lcg"))
    li = [
        _li(4, 1, qty=30.0),   # fold 0: only item 1 trains
        _li(7, 2, qty=7.0),    # fold 3: item 2 never seen in train
    ]
    orders = [_order(4, 1), _order(7, 1)]
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    got = {r["frac"]: r for r in QS["ml_learning_curve"](spark, out).collect()}
    # global train mean is 30 for every fraction → |7 − 30| = 23
    for f in (1, 2, 3):
        assert got[f]["rmse"] == 23.0


def test_soft_dedup_weights_span_sources(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("softdedup"))
    docs = [
        (1, "a b c", "en", "s1", 5),
        (2, "a b c", "en", "s2", 5),  # cross-SOURCE duplicate of doc 1
        (3, "d e", "en", "s1", 3),
    ]
    _write(spark, out, "documents", docs, _DOCS_SCHEMA)
    got = {r["source"]: r for r in
           QS["curation_soft_dedup_weights"](spark, out).collect()}
    # s1: dup copy weighs 3·(1/2), unique doc keeps 2 tokens
    assert got["s1"]["n_docs"] == 2
    assert got["s1"]["n_in_dup_groups"] == 1
    assert got["s1"]["raw_tokens"] == 5
    assert got["s1"]["effective_tokens"] == 3.5
    assert got["s1"]["token_keep_ratio"] == 0.7
    # s2's only doc is discounted by its copy in s1 — the cross-source
    # effect per-source dedup would miss
    assert got["s2"]["effective_tokens"] == 1.5
    assert got["s2"]["token_keep_ratio"] == 0.5


def test_distance_metrics_exact(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dist"))
    a = [3.0] + [0.0] * 63
    b = [0.0, 4.0] + [0.0] * 62
    _write(spark, out, "embeddings", [(1, a, 0), (2, b, 0)], _EMB_SCHEMA)
    row = QS["sim_distance_metrics"](spark, out).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["vec_a"], r["vec_b"]) == (1, 2)
    assert r["dot"] == 0.0 and r["cos_sim"] == 0.0
    assert r["l2"] == 5.0       # 3-4-5 triangle
    assert r["l1"] == 7.0
    assert r["linf"] == 4.0


def test_map_at_k_rank_sensitivity(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mapk"))
    li = (
        [_li(1, 1), _li(2, 1), _li(3, 1)]
        + [_li(1, 2), _li(2, 2)]
        + [_li(1, 3)]
        + [_li(4, 1), _li(8, 3), _li(8, 4)]
    )
    orders = [
        _order(1, 900),
        _order(2, 900),
        _order(3, 900),
        _order(4, 100),
        _order(8, 200),
    ]
    _write(spark, out, "lineitem", li, _LI_SCHEMA)
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    got = {r["user"]: r for r in QS["rec_eval_map_at_k"](spark, out).collect()}
    # user 100: sole relevant item ranked 1 → AP = 1
    assert got[100]["ap_at_10"] == 1.0
    # user 200: first (only) hit at rank 3 → precision 1/3, divided by
    # min(n_rel, 10) = 2 → AP = 1/6
    assert got[200]["n_relevant"] == 2 and got[200]["hits"] == 1
    assert got[200]["ap_at_10"] == _round4(1 / 6)


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_permutation_test_null_is_insignificant(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("permnull"))
    # every user spends identically → stat_obs = 0 and every permuted
    # statistic is also 0 ≥ 0, so p = (1+99)/(1+99) = 1 exactly,
    # independent of the hash assignments
    ev = [
        (i, _T0, i % 20, "view", 10.0, "{}") for i in range(200)
    ]
    _write(spark, out, "events", ev, _EV_SCHEMA)
    row = QS["stats_permutation_test"](spark, out).collect()[0]
    assert row["n_users"] == 20
    assert row["stat_obs_cents"] == 0.0
    assert row["n_perm"] == 99
    assert row["n_ge"] == 99
    assert row["p_value"] == 1.0


def test_permutation_test_detects_separation(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("permsig"))
    # even users spend 0.00, odd users 1000.00 — the observed split IS
    # the maximal-statistic split, so only hash permutations that
    # reproduce it (or its mirror) can tie; p lands at its floor
    ev = [
        (i, _T0, u, "buy", 0.0 if u % 2 == 0 else 1000.0, "{}")
        for i, u in enumerate(range(30))
    ]
    _write(spark, out, "events", ev, _EV_SCHEMA)
    row = QS["stats_permutation_test"](spark, out).collect()[0]
    assert row["n_users"] == 30
    assert row["stat_obs_cents"] == 100000.0  # 1000.00 in cents
    assert row["n_perm"] == 99
    assert row["p_value"] <= 0.05
