"""Crafted-input tests for the round-5 batch-6 keys: rank statistics,
rolling engagement, recommender eval, fuzzy/spatial blocked joins, and
sliding-window chunking.

Same contract as test_inferential.py: tiny parquet fixtures with KNOWN
closed-form answers, run end-to-end through the registered query (the
driver's exact path).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import itertools

import duckdb
import pytest

from movierecommender_sentimentanalysissytem_spark import registry

QS = registry.queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


# Heavyweight evidence tier: quality sweeps / scaled corpora /
# multi-second Spark jobs. Fast iteration path: pytest -m "not slow".
pytestmark = pytest.mark.slow


def _write(spark, out: str, name: str, rows, schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/{name}.parquet")


def _events(spark, out, rows):
    _write(
        spark, out, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_mann_whitney_no_ties_closed_form(spark, tmp_path_factory):
    # clicks {1,2}, views {3,4}: ranks 1..4, R1 = 3, U1 = 0,
    # z = (0 - 2) / sqrt(4·5/12) = -1.549193... -> 4dp -1.5492
    out = str(tmp_path_factory.mktemp("mw1"))
    rows = [
        (1, T0, 1, "click", 1.0, "{}"),
        (2, T0, 1, "click", 2.0, "{}"),
        (3, T0, 1, "view", 3.0, "{}"),
        (4, T0, 1, "view", 4.0, "{}"),
        (5, T0, 1, "error", 99.0, "{}"),  # other types excluded
    ]
    _events(spark, out, rows)
    row = QS["stats_mann_whitney"](spark, out).collect()[0]
    assert (row["n1"], row["n2"]) == (2, 2)
    assert row["u1"] == 0.0
    assert row["z"] == -1.5492


def test_mann_whitney_tie_correction(spark, tmp_path_factory):
    # clicks {1,1}, views {1,2}: avgrank(1) = 2 (3-way tie), so
    # R1 = 4, U1 = 1; tie term t³-t = 24 makes σ² = (1/3)(5-2) = 1
    # -> z = (1-2)/1 = -1 exactly.
    out = str(tmp_path_factory.mktemp("mw2"))
    rows = [
        (1, T0, 1, "click", 1.0, "{}"),
        (2, T0, 1, "click", 1.0, "{}"),
        (3, T0, 1, "view", 1.0, "{}"),
        (4, T0, 1, "view", 2.0, "{}"),
    ]
    _events(spark, out, rows)
    row = QS["stats_mann_whitney"](spark, out).collect()[0]
    assert row["u1"] == 1.0
    assert row["z"] == -1.0


def test_spearman_perfect_monotone(spark, tmp_path_factory):
    # nation 1: spend rises with balance -> rho = 1; nation 2 inverts
    # the order -> rho = -1 (Spearman sees pure monotonicity).
    out = str(tmp_path_factory.mktemp("spear"))
    _write(
        spark, out, "customer",
        [(1, "a", 1, 10.0, "S"), (2, "b", 1, 20.0, "S"), (3, "c", 1, 30.0, "S"),
         (4, "d", 2, 10.0, "S"), (5, "e", 2, 20.0, "S"), (6, "f", 2, 30.0, "S")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    _write(
        spark, out, "orders",
        [(1, 1, "O", 100.0, T0, "p"), (2, 2, "O", 200.0, T0, "p"),
         (3, 3, "O", 900.0, T0, "p"), (4, 4, "O", 900.0, T0, "p"),
         (5, 5, "O", 200.0, T0, "p"), (6, 6, "O", 100.0, T0, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {
        r["nationkey"]: r["rho"]
        for r in QS["stats_spearman_by_group"](spark, out).collect()
    }
    assert got[1] == 1.0
    assert got[2] == -1.0


def test_dau_rolling_window_boundaries(spark, tmp_path_factory):
    # users {1,2} on day 0, user 1 again on day 7. wau7(0) covers days
    # -6..0 -> 2 users; wau7(7) covers days 1..7 -> only user 1. Days
    # with no activity produce no row.
    out = str(tmp_path_factory.mktemp("dau"))
    rows = [
        (1, T0, 1, "view", 1.0, "{}"),
        (2, T0 + dt.timedelta(hours=1), 2, "view", 1.0, "{}"),
        (3, T0 + dt.timedelta(days=7), 1, "click", 1.0, "{}"),
    ]
    _events(spark, out, rows)
    got = {
        r["day_num"]: (r["dau"], r["wau7"])
        for r in QS["events_dau_rolling"](spark, out).collect()
    }
    assert got == {0: (2, 2), 7: (1, 1)}


def test_dau_rolling_six_day_gap_still_counts(spark, tmp_path_factory):
    # activity on day 0 and day 6: day 6's trailing week includes day 0.
    out = str(tmp_path_factory.mktemp("dau2"))
    rows = [
        (1, T0, 1, "view", 1.0, "{}"),
        (2, T0 + dt.timedelta(days=6), 2, "view", 1.0, "{}"),
    ]
    _events(spark, out, rows)
    got = {
        r["day_num"]: (r["dau"], r["wau7"])
        for r in QS["events_dau_rolling"](spark, out).collect()
    }
    assert got == {0: (1, 1), 6: (1, 2)}


def test_precision_at_k_hits_and_recall(spark, tmp_path_factory):
    # train (ok % 4 != 0): item 10 ×3, 20 ×2, 30 ×1 -> all in top-10.
    # test (ok = 4, user 1): items {10, 99} -> 1 hit of 2 relevant.
    out = str(tmp_path_factory.mktemp("prec"))
    _write(
        spark, out, "orders",
        [(1, 7, "O", 1.0, T0, "p"), (2, 7, "O", 1.0, T0, "p"),
         (3, 7, "O", 1.0, T0, "p"), (4, 1, "O", 1.0, T0, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = []
    for i, (ok, item) in enumerate(
        [(1, 10), (2, 10), (2, 20), (3, 10), (3, 20), (3, 30),
         (4, 10), (4, 99)]
    ):
        li.append((ok, item, 0, i, 1.0, 1.0, 0.0, 0.0, "N", "O", T0))
    _write(
        spark, out, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    rows = QS["rec_eval_precision_at_k"](spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user"], r["n_relevant"], r["hits"]) == (1, 2, 1)
    assert r["p_at_10"] == 0.1
    assert r["recall"] == 0.5


def test_fuzzy_levenshtein_blocking_and_threshold(spark, tmp_path_factory):
    # same block ('bolt'): red/rod at distance 1 joins; yellow is 5
    # away from red (> 3) and stays out. 'red washer' shares
    # near-identical text but a different block token, so it is never
    # a candidate.
    out = str(tmp_path_factory.mktemp("fuzz"))
    _write(
        spark, out, "part",
        [(1, "red bolt", "B", "T", 1, 1.0),
         (2, "rod bolt", "B", "T", 1, 1.0),
         (3, "yellow bolt", "B", "T", 1, 1.0),
         (4, "red washer", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    rows = QS["join_fuzzy_levenshtein"](spark, out).collect()
    assert [(r["type_a"], r["type_b"], r["dist"]) for r in rows] == [
        ("red bolt", "rod bolt", 1)
    ]


def test_fuzzy_levenshtein_cross_engine_distances(spark):
    """The docstring's promise: Spark and DuckDB levenshtein agree on
    the real fixture vocabulary (same classic edit distance)."""
    from pyspark.sql import functions as F

    names = [
        r["p_name"]
        for r in spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .select("p_name").distinct().collect()
    ]
    pairs = list(itertools.combinations(sorted(names)[:20], 2))
    sdf = spark.createDataFrame(pairs, "a string, b string").select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    )
    got_spark = {(r["a"], r["b"]): r["d"] for r in sdf.collect()}
    con = duckdb.connect()
    for (a, b), d in got_spark.items():
        dd = con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert dd == d, (a, b, d, dd)


def test_grid_join_equals_naive_all_pairs(spark, tmp_path_factory):
    # Blocking-correctness property: the 3x3 grid probe finds EXACTLY
    # the pairs a naive all-pairs distance filter finds — including
    # pairs straddling cell boundaries.
    out = str(tmp_path_factory.mktemp("grid"))
    _write(
        spark, out, "customer",
        [(k, "c", 0, 0.0, "S") for k in range(1, 120)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    _write(
        spark, out, "supplier",
        [(k, "s", 0) for k in range(1, 120)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    got = {
        (r["c_custkey"], r["s_suppkey"])
        for r in QS["geo_grid_proximity_join"](spark, out).collect()
    }
    want = set()
    for ck in range(1, 120):
        cx, cy = (ck * 131 % 1000) / 10.0, (ck * 197 % 1000) / 10.0
        for sk in range(1, 120):
            sx, sy = (sk * 173 % 1000) / 10.0, (sk * 89 % 1000) / 10.0
            if (cx - sx) ** 2 + (cy - sy) ** 2 <= 4.0:
                want.add((ck, sk))
    assert got == want
    assert want  # the property test must actually exercise matches


def test_chunk_overlap_counts_and_hashes(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("chunk"))
    toks100 = " ".join(f"t{i}" for i in range(100))   # 3 chunks of 40
    toks41 = " ".join(f"u{i}" for i in range(41))     # 40 + trailing 11
    _write(
        spark, out, "documents",
        [(1, toks100, "en", "s", 1), (2, toks41, "en", "s", 1),
         (3, "one", "en", "s", 1), (4, None, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = QS["curation_chunk_overlap"](spark, out).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    assert [by_doc[1][i]["chunk_tokens"] for i in range(3)] == [40, 40, 40]
    assert [by_doc[2][i]["chunk_tokens"] for i in range(2)] == [40, 11]
    assert by_doc[3][0]["chunk_tokens"] == 1
    # NULL text tokenizes as the single empty token
    assert by_doc[4][0]["chunk_tokens"] == 1
    assert by_doc[4][0]["chunk_hash"] == hashlib.md5(b"").hexdigest()
    # chunk 1 of the 100-token doc spans tokens 30..69 (0-based)
    want = " ".join(f"t{i}" for i in range(30, 70)).encode()
    assert by_doc[1][1]["chunk_hash"] == hashlib.md5(want).hexdigest()
    # stride overlap: chunk 1 of doc 2 spans tokens 30..40
    want2 = " ".join(f"u{i}" for i in range(30, 41)).encode()
    assert by_doc[2][1]["chunk_hash"] == hashlib.md5(want2).hexdigest()


# ---- batch 7 ----


def test_cumulative_unique_growth_curve(spark, tmp_path_factory):
    # cust 1 first orders in month 0, custs 2+3 in month 2: the curve
    # is new=[1,2], cum=[1,3] with no row for the empty month 1.
    out = str(tmp_path_factory.mktemp("growth"))
    m0 = dt.datetime(2024, 1, 15)
    m2 = dt.datetime(2024, 3, 1)
    _write(
        spark, out, "orders",
        [(1, 1, "O", 1.0, m0, "p"), (2, 1, "O", 1.0, m2, "p"),
         (3, 2, "O", 1.0, m2, "p"), (4, 3, "O", 1.0, m2, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    rows = sorted(
        QS["events_cumulative_unique"](spark, out).collect(),
        key=lambda r: r["month_num"],
    )
    base = 2024 * 12 + 0
    assert [(r["month_num"] - base, r["new_customers"], r["cum_customers"])
            for r in rows] == [(0, 1, 1), (2, 2, 3)]


def test_rate_spike_flags_and_warmup(spark, tmp_path_factory):
    # 8 baseline days at 10% error rate, then a 50% day: the spike day
    # is flagged against the strictly-historical trailing mean; the
    # first day (no history) is excluded entirely.
    out = str(tmp_path_factory.mktemp("spike"))
    rows, eid = [], 0
    for day in range(8):
        for i in range(10):
            typ = "error" if i == 0 else "view"
            rows.append((eid, T0 + dt.timedelta(days=day, minutes=i),
                         1, typ, 1.0, "{}"))
            eid += 1
    for i in range(10):
        typ = "error" if i < 5 else "view"
        rows.append((eid, T0 + dt.timedelta(days=8, minutes=i),
                     1, typ, 1.0, "{}"))
        eid += 1
    _events(spark, out, rows)
    got = {r["day_num"]: r for r in
           QS["timeseries_rate_spike"](spark, out).collect()}
    assert 0 not in got          # warm-up day has no trailing window
    assert got[8]["is_spike"] is True
    assert got[8]["err_rate"] == 0.5
    assert got[8]["trail_avg"] == 0.1
    assert all(not got[d]["is_spike"] for d in got if d != 8)


def test_weighted_bernoulli_membership_is_deterministic(spark, tmp_path_factory):
    # zero-weight rows can never be sampled; certainty-weight rows
    # (>= 50·10000) always are; and membership is reproducible.
    out = str(tmp_path_factory.mktemp("wbs"))
    orows = [(k, 1, "O", 0.0, T0, "p") for k in range(1, 51)]
    orows += [(k, 1, "O", 600000.0, T0, "p") for k in range(51, 101)]
    _write(
        spark, out, "orders", orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    keys = {r["o_orderkey"]
            for r in QS["sample_weighted_bernoulli"](spark, out).collect()}
    assert keys == set(range(51, 101))
    keys2 = {r["o_orderkey"]
             for r in QS["sample_weighted_bernoulli"](spark, out).collect()}
    assert keys2 == keys


def test_snapshot_diff_classifies_all_three(spark, tmp_path_factory):
    # keys 1..200: 97 and 194 are inserts (absent from v1), 89 and 178
    # deletes (absent from v2), multiples of 31 updates (+10 reprice).
    out = str(tmp_path_factory.mktemp("diff"))
    _write(
        spark, out, "orders",
        [(k, 1, "O", 100.0 * k, T0, "p") for k in range(1, 201)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    rows = QS["maintenance_snapshot_diff"](spark, out).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["change_type"], set()).add(r["o_orderkey"])
    assert by_type["insert"] == {97, 194}
    assert by_type["delete"] == {89, 178}
    assert by_type["update"] == {31, 62, 93, 124, 155, 186}
    upd = {r["o_orderkey"]: r for r in rows if r["change_type"] == "update"}
    assert upd[31]["old_price"] == 3100.0 and upd[31]["new_price"] == 3110.0


def test_multihop_expansion_hops(spark, tmp_path_factory):
    # co-rating graph: items {1,2} share 3 users, {2,3} share 3 users,
    # {1,3} share none, item 4 is isolated. Seed = min item = 1:
    # hop1 = {2}, hop2 = {3}.
    out = str(tmp_path_factory.mktemp("hop"))
    orows, lrows, ok = [], [], 1
    def basket(u, items):
        nonlocal ok
        orows.append((ok, u, "O", 1.0, T0, "p"))
        for ln, it in enumerate(items):
            lrows.append((ok, it, 0, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", T0))
        ok += 1
    for u in (1, 2, 3):
        basket(u, [1, 2])
    for u in (4, 5, 6):
        basket(u, [2, 3])
    basket(7, [4])
    _write(
        spark, out, "orders", orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark, out, "lineitem", lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = {(r["item"], r["hop"])
           for r in QS["rec_multihop_expansion"](spark, out).collect()}
    assert got == {(2, 1), (3, 2)}


# ---- batch 8 ----


def test_expectation_suite_flags_violations(spark, tmp_path_factory):
    # one clean row plus one row violating quantity (<=0), discount
    # (>1), and shipdate (NULL) — price and tax rules stay green.
    out = str(tmp_path_factory.mktemp("dq"))
    _write(
        spark, out, "lineitem",
        [(1, 1, 1, 1, 5.0, 10.0, 0.1, 0.02, "N", "O", T0),
         (2, 1, 1, 1, 0.0, 10.0, 1.5, 0.02, "N", "O", None)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = {r["rule"]: r for r in
           QS["quality_expectation_suite"](spark, out).collect()}
    assert len(got) == 5
    assert all(r["n_checked"] == 2 for r in got.values())
    assert got["quantity_positive"]["n_violations"] == 1
    assert got["discount_in_range"]["n_violations"] == 1
    assert got["shipdate_not_null"]["n_violations"] == 1
    assert got["price_positive"]["n_violations"] == 0
    assert got["price_positive"]["passed"] is True
    assert got["quantity_positive"]["passed"] is False


def test_subsample_ci_degenerate_constant_population(spark, tmp_path_factory):
    # constant values: every fold mean equals the value, sd = 0, and
    # the CI collapses onto the point estimate.
    out = str(tmp_path_factory.mktemp("ci"))
    _write(
        spark, out, "orders",
        [(k, 1, "O", 500.0, T0, "p") for k in range(1, 101)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    r = QS["stats_subsample_ci"](spark, out).collect()[0]
    assert r["n_folds"] == 10
    assert r["mean_of_means"] == 500.0
    assert r["sd_of_means"] == 0.0
    assert r["ci_low"] == 500.0 and r["ci_high"] == 500.0


def test_keyword_cooccurrence_pmi_signs(spark, tmp_path_factory):
    # 10 docs: 'a b' in 5, 'a c' in 5 (plus filler to differentiate
    # df). Pair (a,b): c_ab=5, df_a=10, df_b=5 -> PMI = ln(10·5/50) =
    # 0 exactly; (b,c) never co-occur -> absent.
    out = str(tmp_path_factory.mktemp("pmi"))
    drows = [(i, "a b", "en", "s", 1) for i in range(5)]
    drows += [(i + 5, "a c", "en", "s", 1) for i in range(5)]
    _write(
        spark, out, "documents", drows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {(r["word_a"], r["word_b"]): r for r in
           QS["text_keyword_cooccurrence"](spark, out).collect()}
    assert set(got) == {("a", "b"), ("a", "c")}
    assert got[("a", "b")]["c_ab"] == 5
    assert got[("a", "b")]["pmi"] == 0.0
    assert got[("a", "c")]["pmi"] == 0.0


def test_feature_hashing_is_pure_function_of_token(spark, tmp_path_factory):
    # identical texts hash to identical (bucket, weight) profiles, and
    # weights count occurrences (not distinct tokens).
    out = str(tmp_path_factory.mktemp("fh"))
    _write(
        spark, out, "documents",
        [(1, "x x y", "en", "s", 1), (2, "x x y", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = QS["ml_feature_hashing"](spark, out).collect()
    prof = {}
    for r in rows:
        prof.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    assert prof[1] == prof[2]
    assert sorted(prof[1].values()) == [1, 2]
    assert all(0 <= b < 64 for b in prof[1])


def test_cohort_ltv_accumulates_per_cohort(spark, tmp_path_factory):
    # cohort Jan: custs 1,2 (100 + 200 in m0; cust 1 spends 50 in m1);
    # cohort Feb: cust 3 (40). LTV divides by cohort size.
    out = str(tmp_path_factory.mktemp("ltv"))
    jan, feb = dt.datetime(2024, 1, 5), dt.datetime(2024, 2, 5)
    _write(
        spark, out, "orders",
        [(1, 1, "O", 100.0, jan, "p"), (2, 2, "O", 200.0, jan, "p"),
         (3, 1, "O", 50.0, feb, "p"), (4, 3, "O", 40.0, feb, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    rows = QS["events_cohort_ltv"](spark, out).collect()
    jan_m = 2024 * 12 + 0
    feb_m = 2024 * 12 + 1
    got = {(r["cohort_month"], r["month_offset"]):
           (r["n_customers"], r["cum_revenue"], r["ltv_per_customer"])
           for r in rows}
    assert got[(jan_m, 0)] == (2, 300.0, 150.0)
    assert got[(jan_m, 1)] == (2, 350.0, 175.0)
    assert got[(feb_m, 0)] == (1, 40.0, 40.0)


# ---- batch 9 ----


def test_association_rules_directional_confidence(spark, tmp_path_factory):
    # 10 baskets contain {A,B}; 10 more contain only A. So A appears in
    # 20 baskets, B in 10: confidence(B->A) = 1.0 qualifies both ways
    # but confidence(A->B) = 0.5; lift = 20·10/(20·10) = 1.0.
    out = str(tmp_path_factory.mktemp("assoc"))
    orows, lrows, ok = [], [], 1
    def basket(u, items):
        nonlocal ok
        orows.append((ok, u, "O", 1.0, T0, "p"))
        for ln, it in enumerate(items):
            lrows.append((ok, it, 0, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", T0))
        ok += 1
    for u in range(1, 11):
        basket(u, [100, 200])
    for u in range(11, 21):
        basket(u, [100])
    _write(
        spark, out, "orders", orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark, out, "lineitem", lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = {(r["antecedent"], r["consequent"]): r for r in
           QS["rec_association_rules"](spark, out).collect()}
    assert set(got) == {(100, 200), (200, 100)}
    assert got[(200, 100)]["confidence"] == 1.0
    assert got[(100, 200)]["confidence"] == 0.5
    assert got[(100, 200)]["lift"] == 1.0
    assert got[(100, 200)]["support"] == 0.5
    assert got[(100, 200)]["n_cobuy"] == 10


def test_random_projection_shape_and_linearity(spark, tmp_path_factory):
    # Projection of the zero vector is zero in every component; the
    # projection is linear: proj(2v) = 2·proj(v) (exact doubles).
    out = str(tmp_path_factory.mktemp("rp"))
    v = [0.5] * 64
    rows = [(1, [0.0] * 64, 0), (2, v, 0), (3, [x * 2 for x in v], 0)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    got = {}
    for r in QS["embedding_random_projection"](spark, out).collect():
        got.setdefault(r["vec_id"], {})[r["component"]] = r["value"]
    assert set(got[1].values()) == {0.0}
    assert len(got[2]) == 8
    for j in range(8):
        assert abs(got[3][j] - 2 * got[2][j]) < 2e-4  # 4dp rounds compose


def test_batch_scoring_decision_from_linear_term(spark, tmp_path_factory):
    # z = -1 + 0.1·qty - 2·disc + 5·tax: qty=10 -> z=0 -> decision True
    # with score exactly 0.5; qty=9.9 -> z<0 -> False.
    out = str(tmp_path_factory.mktemp("score"))
    _write(
        spark, out, "lineitem",
        [(1, 1, 1, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", T0),
         (2, 1, 1, 2, 9.9, 1.0, 0.0, 0.0, "N", "O", T0),
         (3, 1, 1, 3, 20.0, 1.0, 0.5, 0.2, "N", "O", T0)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = {r["l_linenumber"]: r for r in
           QS["ml_batch_scoring"](spark, out).collect()}
    assert got[1]["decision"] is True and got[1]["score"] == 0.5
    assert got[2]["decision"] is False and got[2]["score"] < 0.5
    # z = -1 + 2 - 1 + 1 = 1 -> sigmoid(1) ≈ 0.7311
    assert got[3]["decision"] is True and got[3]["score"] == 0.7311


def test_except_distinct_vs_except_all_semantics(spark, tmp_path_factory):
    # cust 1 has TWO urgent orders and no big one: EXCEPT ALL keeps
    # both copies (set_except), EXCEPT DISTINCT keeps one.
    out = str(tmp_path_factory.mktemp("exc"))
    _write(
        spark, out, "orders",
        [(1, 1, "O", 100.0, T0, "1-URGENT"),
         (2, 1, "O", 100.0, T0, "1-URGENT"),
         (3, 2, "O", 999999.0, T0, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    all_rows = [r["o_custkey"]
                for r in QS["set_except"](spark, out).collect()]
    dist_rows = [r["o_custkey"]
                 for r in QS["set_except_distinct"](spark, out).collect()]
    assert sorted(all_rows) == [1, 1]
    assert dist_rows == [1]


def test_dpp_result_matches_plain_join(spark, tmp_path_factory):
    # The pruned partitioned read must return exactly what the plain
    # in-memory join returns.
    out = str(tmp_path_factory.mktemp("dpp"))
    rows = []
    for i, fl in enumerate(["A", "N", "R", "R", "N"]):
        rows.append((i, 1, 1, 1, 1.0, 100.0 * (i + 1), 0.0, 0.0,
                     fl, "O", T0))
    _write(
        spark, out, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = QS["join_dynamic_partition_pruning"](spark, out).collect()
    assert len(got) == 1
    assert got[0]["label"] == "returned"
    assert got[0]["n"] == 2
    assert got[0]["revenue"] == 700.0  # rows 300 + 400


# ---- batch 11 ----


def test_feature_scaling_degenerate_groups_null(spark, tmp_path_factory):
    # group 'C' has constant price and constant quantity: both scaled
    # features must be NULL (NULLIF), never inf/NaN. Group 'V' checks
    # the closed-form min-max and z-score values.
    out = str(tmp_path_factory.mktemp("scale"))
    rows = [
        (1, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "V", "O", T0),
        (2, 1, 1, 2, 20.0, 200.0, 0.0, 0.0, "V", "O", T0),
        (3, 1, 1, 3, 5.0, 50.0, 0.0, 0.0, "C", "O", T0),
        (4, 1, 1, 4, 5.0, 50.0, 0.0, 0.0, "C", "O", T0),
    ]
    _write(
        spark, out, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = {r["l_linenumber"]: r for r in
           QS["ml_feature_scaling"](spark, out).collect()}
    assert got[1]["price_minmax"] == 0.0
    assert got[2]["price_minmax"] == 1.0
    # z-scores of {10, 20}: mean 15, sd_samp = sqrt(50) -> ±0.7071
    assert got[1]["qty_zscore"] == -0.7071
    assert got[2]["qty_zscore"] == 0.7071
    assert got[3]["price_minmax"] is None
    assert got[3]["qty_zscore"] is None


def test_target_encoding_shrinks_rare_categories(spark, tmp_path_factory):
    # global mean 5. Brand 'rare' has ONE row with y=100: encoded =
    # (100 + 10·5)/(1+10) = 150/11 ≈ 13.6364 — pulled hard toward the
    # prior. Brand 'big' has 10 rows of y=4: (40+50)/20 = 4.5.
    out = str(tmp_path_factory.mktemp("te"))
    lrows = [(1, 1, 1, 1, 100.0, 1.0, 0.0, 0.0, "N", "O", T0)]
    for i in range(10):
        lrows.append((2 + i, 2, 1, 1, 4.0, 1.0, 0.0, 0.0, "N", "O", T0))
    # pad rows on a third brand to set the global mean to exactly 5:
    # sum so far 140 over 11 rows; 9 rows of y=1 -> 149/20 ... instead
    # use 4 rows of y=15 -> (140+60)/15 = 13.33 no. Compute directly:
    # add k rows of value v so (140 + k·v)/(11+k) = 5 -> k·v = 5k - 85
    # k=18, v≈... simpler: k=17, v=0 -> 140/28 = 5.0 exactly.
    for i in range(17):
        lrows.append((20 + i, 3, 1, 1, 0.0, 1.0, 0.0, 0.0, "N", "O", T0))
    _write(
        spark, out, "lineitem", lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    _write(
        spark, out, "part",
        [(1, "a", "rare", "T", 1, 1.0), (2, "b", "big", "T", 1, 1.0),
         (3, "c", "pad", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    got = {r["category"]: r for r in
           QS["ml_target_encoding"](spark, out).collect()}
    assert got["rare"]["encoded"] == 13.6364
    assert got["big"]["encoded"] == 4.5


def test_stickiness_bounds_and_value(spark, tmp_path_factory):
    # day 0: users {1,2}; day 10: user 1 only. stickiness(10) =
    # 1/2 (user 2 still inside the trailing 30 days); stickiness(0) = 1.
    out = str(tmp_path_factory.mktemp("stick"))
    rows = [
        (1, T0, 1, "view", 1.0, "{}"),
        (2, T0, 2, "view", 1.0, "{}"),
        (3, T0 + dt.timedelta(days=10), 1, "view", 1.0, "{}"),
    ]
    _events(spark, out, rows)
    got = {r["day_num"]: r for r in
           QS["events_stickiness"](spark, out).collect()}
    assert got[0]["stickiness"] == 1.0
    assert (got[10]["dau"], got[10]["mau30"]) == (1, 2)
    assert got[10]["stickiness"] == 0.5


def test_ignore_corrupt_files_keeps_good_rows(spark, tmp_path_factory):
    # run against a crafted orders table; the query plants its own
    # corrupt file — all even-key rows must come back.
    out = str(tmp_path_factory.mktemp("corrupt"))
    _write(
        spark, out, "orders",
        [(k, 1, "O", 100.0, T0, "p") for k in range(1, 21)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    rows = QS["scan_ignore_corrupt_files"](spark, out).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 10          # keys 2,4,...,20
    assert rows[0]["total"] == 1000.0


# ---- batch 12 ----


def test_ab_test_closed_form(spark, tmp_path_factory):
    # Build users whose md5 arm assignment is KNOWN, with conversion
    # (value>150 purchase) fully controlled per user: arm0 = {1 of 2
    # converts}, arm1 = {2 of 2 convert}.
    import hashlib

    def arm(uid):
        h = hashlib.md5(f"ab:{uid}".encode()).hexdigest()
        return int(h[:15], 16) % 2

    arm0 = [u for u in range(1, 40) if arm(u) == 0][:2]
    arm1 = [u for u in range(1, 40) if arm(u) == 1][:2]
    out = str(tmp_path_factory.mktemp("ab"))
    rows, eid = [], 0
    for u, conv in [(arm0[0], True), (arm0[1], False),
                    (arm1[0], True), (arm1[1], True)]:
        rows.append((eid, T0, u, "view", 1.0, "{}")); eid += 1
        if conv:
            rows.append((eid, T0, u, "purchase", 200.0, "{}")); eid += 1
        else:
            rows.append((eid, T0, u, "purchase", 10.0, "{}")); eid += 1
    _events(spark, out, rows)
    r = QS["events_ab_test_analysis"](spark, out).collect()[0]
    assert (r["n0"], r["x0"], r["n1"], r["x1"]) == (2, 1, 2, 2)
    assert r["rate0"] == 0.5 and r["rate1"] == 1.0
    assert r["lift"] == 0.5
    # pooled p = 3/4 -> z = 0.5 / sqrt(0.1875 * 1) = 1.1547
    assert r["z"] == 1.1547


def test_ab_test_z_null_when_everyone_converts(spark, tmp_path_factory):
    import hashlib

    def arm(uid):
        h = hashlib.md5(f"ab:{uid}".encode()).hexdigest()
        return int(h[:15], 16) % 2

    a0 = next(u for u in range(1, 40) if arm(u) == 0)
    a1 = next(u for u in range(1, 40) if arm(u) == 1)
    out = str(tmp_path_factory.mktemp("ab0"))
    rows = [(1, T0, a0, "purchase", 200.0, "{}"),
            (2, T0, a1, "purchase", 200.0, "{}")]
    _events(spark, out, rows)
    r = QS["events_ab_test_analysis"](spark, out).collect()[0]
    assert r["lift"] == 0.0
    assert r["z"] is None  # zero pooled variance -> undefined, not inf


def test_diversity_gini_extremes(spark, tmp_path_factory):
    # 4 users all rate item 1 highest (and only 1 extra item each with
    # lower rating): exposure is concentrated -> gini > 0, coverage =
    # recommended/catalog computed exactly.
    out = str(tmp_path_factory.mktemp("div"))
    orows, lrows, ok = [], [], 1
    for u in range(1, 5):
        orows.append((ok, u, "O", 1.0, T0, "p"))
        lrows.append((ok, 1, 0, 1, 50.0, 1.0, 0.0, 0.0, "N", "O", T0))
        lrows.append((ok, 10 + u, 0, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", T0))
        ok += 1
    _write(
        spark, out, "orders", orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark, out, "lineitem", lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    _write(
        spark, out, "part",
        [(k, "p", "B", "T", 1, 1.0) for k in [1, 11, 12, 13, 14] + [99]],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    r = QS["rec_diversity_coverage"](spark, out).collect()[0]
    # 5 distinct items recommended of 6 catalog items
    assert r["n_items_recommended"] == 5
    assert r["n_items_catalog"] == 6
    assert r["coverage"] == 0.8333
    # exposures [1,1,1,1,4]: gini = 2*(1+2+3+4+4*5)/(5*8) - 6/5 = 0.3
    assert r["exposure_gini"] == 0.3


def test_stream_windowed_topk_rank_and_cut(spark, tmp_path_factory):
    # one 10-min window with four types at counts 3/2/2/1: top-3 keeps
    # the count-3 type and the two count-2 types (alphabetical
    # tie-break), drops the count-1 type.
    out = str(tmp_path_factory.mktemp("swtk"))
    rows, eid = [], 0
    for typ, cnt in [("view", 3), ("click", 2), ("error", 2),
                     ("purchase", 1)]:
        for i in range(cnt):
            rows.append((eid, T0 + dt.timedelta(seconds=eid), 1, typ,
                         1.0, "{}"))
            eid += 1
    _events(spark, out, rows)
    got = [(r["event_type"], r["n"], r["rnk"]) for r in sorted(
        QS["stream_windowed_topk"](spark, out).collect(),
        key=lambda r: r["rnk"])]
    assert got == [("view", 3, 1), ("click", 2, 2), ("error", 2, 3)]


def test_join_skew_profile_values(spark, tmp_path_factory):
    # keys: 1 ×6, 2 ×2, 3 ×1, 4 ×1: n_keys 4, max 6, avg 2.5,
    # skew_ratio 2.4; heavy list ordered by count desc then key.
    out = str(tmp_path_factory.mktemp("skew"))
    rows = []
    for i, pk in enumerate([1] * 6 + [2] * 2 + [3, 4]):
        rows.append((i, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", T0))
    _write(
        spark, out, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = sorted(QS["profile_join_skew"](spark, out).collect(),
                 key=lambda r: r["rank"])
    assert [(r["heavy_key"], r["heavy_rows"]) for r in got] == [
        (1, 6), (2, 2), (3, 1), (4, 1)]
    assert got[0]["n_keys"] == 4
    assert got[0]["avg_rows"] == 2.5
    assert got[0]["skew_ratio"] == 2.4


def test_window_funnel_time_cap(spark, tmp_path_factory):
    # user 1 converts inside the hour; user 2's purchase comes 2h
    # after their click (out of window); user 3 purchases with NO
    # prior click; user 4 clicks only.
    out = str(tmp_path_factory.mktemp("wf"))
    rows = [
        (1, T0, 1, "click", 1.0, "{}"),
        (2, T0 + dt.timedelta(minutes=30), 1, "purchase", 5.0, "{}"),
        (3, T0, 2, "click", 1.0, "{}"),
        (4, T0 + dt.timedelta(hours=2), 2, "purchase", 5.0, "{}"),
        (5, T0, 3, "purchase", 5.0, "{}"),
        (6, T0, 4, "click", 1.0, "{}"),
    ]
    _events(spark, out, rows)
    r = QS["events_window_funnel"](spark, out).collect()[0]
    assert (r["n_users"], r["n_clicked"], r["n_converted_1h"]) == (4, 3, 1)
    assert r["conv_rate"] == 0.3333


def test_power_analysis_closed_form(spark, tmp_path_factory):
    import hashlib

    def arm(uid):
        h = hashlib.md5(f"ab:{uid}".encode()).hexdigest()
        return int(h[:15], 16) % 2

    # 2 users per arm; exactly one converter total -> p = 0.25.
    arm0 = [u for u in range(1, 60) if arm(u) == 0][:2]
    arm1 = [u for u in range(1, 60) if arm(u) == 1][:2]
    out = str(tmp_path_factory.mktemp("pow"))
    rows, eid = [], 0
    for u in arm0 + arm1:
        val = 200.0 if u == arm0[0] else 10.0
        rows.append((eid, T0, u, "purchase", val, "{}")); eid += 1
    _events(spark, out, rows)
    r = QS["stats_power_analysis"](spark, out).collect()[0]
    assert (r["n_total"], r["n_per_arm"]) == (4, 2)
    assert r["baseline_rate"] == 0.25
    # mde = 2.8016 * sqrt(2*0.25*0.75/2) = 2.8016*sqrt(0.1875)
    import math
    raw = 2.8016 * math.sqrt(0.1875)
    assert r["mde_abs"] == math.floor(raw * 10000 + 0.5) / 10000
    # relative MDE divides the UNROUNDED absolute value
    assert r["mde_rel"] == math.floor(raw / 0.25 * 10000 + 0.5) / 10000


def test_backlog_curve_reconciles(spark, tmp_path_factory):
    # order 1 placed day0 ships day2; order 2 placed day1 ships day1:
    # backlog by day = [1, 1, 0] with placement/completion columns.
    d0 = dt.datetime(1992, 1, 1)
    out = str(tmp_path_factory.mktemp("backlog"))
    _write(
        spark, out, "orders",
        [(1, 1, "O", 1.0, d0, "p"),
         (2, 1, "O", 1.0, d0 + dt.timedelta(days=1), "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark, out, "lineitem",
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          d0 + dt.timedelta(days=1)),
         (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
          d0 + dt.timedelta(days=2)),
         (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          d0 + dt.timedelta(days=1))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = {r["day_num"]: (r["placed"], r["completed"], r["open_backlog"])
           for r in QS["timeseries_backlog_curve"](spark, out).collect()}
    # day0: order1 placed; day1: order2 placed AND completed (its only
    # line ships day1); day2: order1's last line ships -> completed.
    assert got == {0: (1, 0, 1), 1: (1, 1, 1), 2: (0, 1, 0)}
