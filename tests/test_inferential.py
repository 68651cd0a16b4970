"""Crafted-input tests for the round-5 inferential/behavioral keys.

Each test writes a tiny parquet fixture dir with KNOWN statistics and
runs the real registered query end-to-end through table() — the same
path the driver exercises — asserting the closed-form expected values.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from movierecommender_sentimentanalysissytem_spark import registry

QS = registry.queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, out: str, name: str, rows, schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/{name}.parquet")


@pytest.fixture(scope="module")
def crafted(spark, tmp_path_factory):
    """One crafted dir reused across tests (each table independent)."""
    out = str(tmp_path_factory.mktemp("crafted_sf"))

    # orders: priority 'ident' has IDENTICAL O/F totals -> KS D = 0;
    # 'disj' has disjoint O < F totals -> KS D = 1. 'flat' totals are
    # all equal -> Gini 0; 'onehot' is [0,0,0,10] -> Gini 0.75.
    orows = []
    k = 0
    for v in (10.0, 20.0, 30.0):
        for st in ("O", "F"):
            orows.append((k, 0, st, v, T0, "ident"))
            k += 1
    for st, vals in (("O", (1.0, 2.0)), ("F", (100.0, 200.0))):
        for v in vals:
            orows.append((k, 0, st, v, T0, "disj"))
            k += 1
    for v in (5.0, 5.0, 5.0, 5.0):
        orows.append((k, 0, "O", v, T0, "flat"))
        k += 1
    for v in (0.0, 0.0, 0.0, 10.0):
        orows.append((k, 0, "O", v, T0, "onehot"))
        k += 1
    _write(
        spark, out, "orders", orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )

    # lineitem: flag 'L' lies exactly on y = 2x + 1 (r2 = 1); flag 'U'
    # is 99 unit values plus one extreme outlier for the IQR fence.
    lrows = []
    for i, x in enumerate((1.0, 2.0, 3.0, 4.0, 5.0)):
        lrows.append((i, i, i, 1, x, 2.0 * x + 1.0, 0.0, 0.0, "L", "O", T0))
    for i in range(99):
        lrows.append((100 + i, i, i, 1, 1.0, float(i % 7), 0.0, 0.0,
                      "U", "O", T0))
    lrows.append((999, 0, 0, 1, 1.0, 1e6, 0.0, 0.0, "U", "O", T0))
    _write(
        spark, out, "lineitem", lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )

    # customer: one per segment so chi-square sees a 1:1 mapping.
    _write(
        spark, out, "customer", [(0, "c", 0, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )

    # events: user 1 has a 30-min-gap session split; user 2 interleaves
    # clicks and purchases for attribution; both give known OHLC bars.
    def ev(eid, sec, uid, typ, val):
        return (eid, T0 + dt.timedelta(seconds=sec), uid, typ, val, "{}")

    erows = [
        ev(1, 0, 1, "view", 10.0),
        ev(2, 100, 1, "view", 30.0),
        ev(3, 100 + 1801 + 100, 1, "purchase", 20.0),  # gap 1801s -> new
        ev(10, 0, 2, "purchase", 5.0),    # purchase BEFORE any click
        ev(11, 60, 2, "click", 1.0),
        ev(12, 120, 2, "click", 2.0),
        ev(13, 180, 2, "purchase", 7.0),  # attributes to click 12
    ]
    _write(
        spark, out, "events", erows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    # documents: uniform-4 tokens -> entropy ln 4; single token -> 0;
    # src 'dup' is 3 docs with 2 identical texts -> dup_rate 1/3.
    drows = [
        (1, "a b c d", "en", "uni", 7),
        (2, "x x x x x", "en", "uni", 9),
        (3, "p q", "en", "dup", 3),
        (4, "p q", "en", "dup", 3),
        (5, "r s", "en", "dup", 3),
    ]
    _write(
        spark, out, "documents", drows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return out


def test_ks_identical_zero_disjoint_one(spark, crafted):
    got = {
        r["o_orderpriority"]: r["d_stat"]
        for r in QS["stats_ks_two_sample"](spark, crafted).collect()
    }
    assert got["ident"] == 0.0
    assert got["disj"] == 1.0
    # groups with an empty sample ('flat'/'onehot' are all-'O') have no
    # defined KS statistic and must be absent, not inf/null/crash
    assert set(got) == {"ident", "disj"}


def test_gini_flat_zero_onehot_three_quarters(spark, crafted):
    got = {
        r["o_orderpriority"]: r["gini"]
        for r in QS["stats_gini_concentration"](spark, crafted).collect()
    }
    assert got["flat"] == 0.0
    # [0,0,0,10]: G = 2*(4*10)/(4*10) - 5/4 = 0.75 — max concentration
    # for n=4 is (n-1)/n
    assert got["onehot"] == 0.75


def test_linear_regression_exact_line(spark, crafted):
    rows = {
        r["l_returnflag"]: r
        for r in QS["stats_linear_regression"](spark, crafted).collect()
    }
    row = rows["L"]
    assert row["slope"] == 2.0
    assert row["intercept"] == 1.0
    assert row["r2"] == 1.0
    assert row["n"] == 5
    # constant-x group: regr_* SQL semantics -> NULLs, never a raise
    u = rows["U"]
    assert u["slope"] is None and u["intercept"] is None and u["r2"] is None


def test_iqr_fence_catches_single_outlier(spark, crafted):
    row = {
        r["l_returnflag"]: r
        for r in QS["quality_outlier_iqr"](spark, crafted).collect()
    }["U"]
    assert row["n_outliers"] == 1
    assert row["iqr"] == row["q3"] - row["q1"]


def test_chi_square_degenerate_single_cell(spark, crafted):
    # one segment x one priority ('ident' only after the join? no — all
    # orders join to the single customer, priorities vary) -> dof =
    # (1-1)*(nprio-1) = 0 and chi2 = 0: o = r*c/N exactly when one
    # margin is a single category.
    row = QS["stats_chi_square"](spark, crafted).collect()[0]
    assert row["dof"] == 0
    assert row["chi2"] == 0.0


def test_sessionize_gap_splits_sessions(spark, crafted):
    rows = [
        r
        for r in QS["sessionize_batch"](spark, crafted).collect()
        if r["user_id"] == 1
    ]
    by_id = {r["session_id"]: r for r in rows}
    assert len(by_id) == 2
    assert by_id[1]["n_events"] == 2 and by_id[1]["duration_s"] == 100
    assert by_id[2]["n_events"] == 1 and by_id[2]["n_purchases"] == 1


def test_attribution_last_touch_and_unattributed(spark, crafted):
    rows = {
        r["purchase_id"]: r
        for r in QS["attribution_last_touch"](spark, crafted).collect()
    }
    assert rows[10]["attributed_click_id"] is None  # no click before it
    assert rows[13]["attributed_click_id"] == 12    # latest, not first
    assert rows[13]["gap_s"] == 60


def test_ohlc_bar_edges(spark, crafted):
    bars = {
        (r["event_type"], str(r["day"])): r
        for r in QS["timeseries_resample_ohlc"](spark, crafted).collect()
    }
    v = bars[("view", "2024-01-01")]
    assert (v["open"], v["close"]) == (10.0, 30.0)
    assert (v["low"], v["high"]) == (10.0, 30.0)
    p = bars[("purchase", "2024-01-01")]
    assert (p["open"], p["close"]) == (5.0, 20.0)  # user order by ts
    assert p["n_events"] == 3


def test_word_entropy_uniform_and_degenerate(spark, crafted):
    rows = {
        r["doc_id"]: r for r in QS["text_word_entropy"](spark, crafted).collect()
    }
    assert rows[1]["entropy"] == pytest.approx(math.log(4.0), abs=1e-4)
    assert rows[1]["n_distinct"] == 4
    assert rows[2]["entropy"] == 0.0
    assert rows[2]["n_tokens"] == 5


def test_duplicate_rate_by_source(spark, crafted):
    rows = {
        r["source"]: r
        for r in QS["quality_duplicate_rate_by_source"](spark, crafted).collect()
    }
    assert rows["dup"]["n_docs"] == 3 and rows["dup"]["n_distinct"] == 2
    assert rows["dup"]["dup_rate"] == pytest.approx(1 / 3, abs=1e-4)
    assert rows["uni"]["dup_rate"] == 0.0


def test_rfm_quartile_convention(spark, tmp_path_factory):
    """8 users with frequencies 1..8: quantile_cont boundaries are
    (2.75, 4.5, 6.25), and the '<=' convention must map freq 1,2 -> 4;
    3,4 -> 3; 5,6 -> 2; 7,8 -> 1."""
    out = str(tmp_path_factory.mktemp("rfm_sf"))
    rows = []
    eid = 0
    for uid in range(1, 9):
        for j in range(uid):  # user uid makes uid purchases
            rows.append(
                (eid, T0 + dt.timedelta(seconds=60 * eid), uid,
                 "purchase", 1.0, "{}")
            )
            eid += 1
    _write(
        spark, out, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["user_id"]: r for r in QS["rec_rfm_segmentation"](spark, out).collect()
    }
    want_f = {1: 4, 2: 4, 3: 3, 4: 3, 5: 2, 6: 2, 7: 1, 8: 1}
    assert {u: r["f_q"] for u, r in got.items()} == want_f
    for u, r in got.items():
        assert r["segment"] == f"{r['r_q']}-{r['f_q']}-{r['m_q']}"


def test_matmul_topk_matches_jvm_fold_ranking(spark):
    """The GEMM path must reproduce the JVM in-order fold's top-3 under
    the shared rounded-score ranking on the real fixture corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from movierecommender_sentimentanalysissytem_spark.functions.rounding import (
        round4,
    )
    from movierecommender_sentimentanalysissytem_spark.functions.vector import (
        _DOT,
        _NORM,
    )
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table
    from tests.conftest import SF_SMALL

    e = table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("a")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("b")
    )
    cos = F.expr(_DOT) / (
        F.expr(_NORM.format(v="a")) * F.expr(_NORM.format(v="b"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    want = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", round4(cos))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )
    got = QS["sim_matmul_topk"](spark, SF_SMALL)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
