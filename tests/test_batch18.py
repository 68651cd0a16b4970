"""Crafted-input tests for the round-5 batch-18 keys: conversion
latency quantiles, readability scoring, and the CSV DROPMALFORMED
policy (including the column-pruning trap it pins).
"""

from __future__ import annotations

import datetime as dt
import math
import os

from movierecommender_sentimentanalysissytem_spark import registry

QS = registry.queries()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate date, o_orderpriority string"
)


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


def _ev(eid, uid, typ, secs):
    return (eid, T0 + dt.timedelta(seconds=secs), uid, typ, 1.0, "{}")


def test_conversion_latency_discrete_quantiles(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lat"))
    rows = [
        # four converters with delays 10, 20, 30, 40
        _ev(1, 1, "click", 0), _ev(2, 1, "purchase", 10),
        _ev(3, 2, "click", 0), _ev(4, 2, "purchase", 20),
        _ev(5, 3, "click", 0), _ev(6, 3, "purchase", 30),
        _ev(7, 4, "click", 0), _ev(8, 4, "purchase", 40),
        # purchase strictly before the first click: not a conversion
        _ev(9, 5, "purchase", 0), _ev(10, 5, "click", 100),
        # click with no purchase: not a conversion
        _ev(11, 6, "click", 0),
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    r = QS["events_conversion_latency_quantiles"](spark, out).collect()[0]
    # ranks: p50 = (4+1)//2 = 2 -> 20 s; p90 = (36+9)//10 = 4 -> 40 s
    assert (r["n_conv"], r["p50_s"], r["p90_s"]) == (4, 20, 40)


def test_conversion_latency_duplicate_delays(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lat2"))
    rows = [
        _ev(1, 1, "click", 0), _ev(2, 1, "purchase", 10),
        _ev(3, 2, "click", 0), _ev(4, 2, "purchase", 10),
        _ev(5, 3, "click", 0), _ev(6, 3, "purchase", 30),
    ]
    _write(spark, out, "events", rows, _EV_SCHEMA)
    r = QS["events_conversion_latency_quantiles"](spark, out).collect()[0]
    # delays {10: 2, 30: 1}: p50 rank 2 -> cc(10)=2 -> 10;
    # p90 rank (27+9)//10 = 3 -> 30
    assert (r["n_conv"], r["p50_s"], r["p90_s"]) == (3, 10, 30)


def test_readability_closed_form_and_empty_doc(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("read"))
    docs = [
        (1, "The cat sat. It ran!", "en", "s", 20),
        (2, "", "en", "s", 0),
    ]
    _write(
        spark, out, "documents", docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = {r["doc_id"]: r for r in
           QS["text_readability_score"](spark, out).collect()}
    r1 = got[1]
    assert (r1["words"], r1["sentences"], r1["syllables"]) == (5, 2, 5)
    assert r1["flesch"] == _round4(206.835 - 1.015 * 2.5 - 84.6 * 1.0)
    r2 = got[2]
    assert (r2["words"], r2["sentences"], r2["syllables"]) == (0, 1, 0)
    assert r2["flesch"] is None


def test_dropmalformed_keeps_valid_rows_only(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("csvmal"))
    d = dt.date(2024, 1, 1)
    orders = [
        (k, 1, "O", float(100 * k), d, "1-URGENT") for k in (19, 20, 40, 41)
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    rows = QS["scan_csv_dropmalformed"](spark, out).collect()
    # survivors are exactly the fixture slice o_orderkey % 20 == 0
    assert len(rows) == 1
    assert rows[0]["o_orderpriority"] == "1-URGENT"
    assert rows[0]["n"] == 2
    assert rows[0]["total"] == 100.0 * 20 + 100.0 * 40


def test_dropmalformed_column_pruning_trap_is_real(spark, tmp_path):
    """The gotcha the key's o_orderkey gate defends against: with
    column pruning (the default), malformed-row detection only sees
    the parsed columns, so an under-arity line survives as NULLs when
    the plan never parses the failing column — and a bare count()
    parses nothing, counting every garbage line. If either assertion
    here starts failing, Spark changed the semantics and the gate in
    scan_csv_dropmalformed should be revisited."""
    out = str(tmp_path)
    with open(os.path.join(out, "m.csv"), "w") as fh:
        fh.write("1,2.5,OK\n")
        fh.write("justonefield\n")
    read = (
        spark.read.schema("a BIGINT, b DOUBLE, c STRING")
        .option("mode", "DROPMALFORMED")
        .csv(out)
    )
    # pruned to column c only: the bad line is NOT judged malformed
    assert read.select("c").count() == 2
    # parsing column a forces the failure and drops the line
    assert read.filter("a IS NOT NULL").count() == 1


def test_array_higher_order_lambdas(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hof"))
    parts = [
        (1, "shiny widget", "B", "T", 1, 10.0),
        (2, "dull bolt", "B", "T", 1, 10.0),
    ]
    _write(
        spark, out, "part", parts,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    got = {r["p_partkey"]: r for r in
           QS["fn_array_higher_order"](spark, out).collect()}
    r1 = got[1]
    # array outputs project as '|'-joined strings (driver-canonicalizer
    # contract — raw list cells crash its sort; see agg_collect)
    assert r1["long_words"] == "widget"
    assert r1["upper_words"] == "SHINY|WIDGET"
    assert r1["total_chars"] == 11
    assert r1["is_mechanical"] is True
    r2 = got[2]
    assert r2["long_words"] == ""
    assert r2["total_chars"] == 8
    assert r2["is_mechanical"] is False


def test_regexp_backref_replacements(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("backref"))
    cust = [(7, "Customer#000000042", 1, 0.0, "AUTO")]
    _write(
        spark, out, "customer", cust,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    r = QS["fn_regexp_replace_backrefs"](spark, out).collect()[0]
    assert r["swapped"] == "000000042:Customer"
    assert r["compact"] == "Customer-42"
    assert r["masked"] == "Customer##########"


def test_shipping_delay_profile_exact_ranks(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("delay"))
    d0 = dt.date(2024, 1, 10)
    orders = [(k, 1, "O", 10.0, d0, "1-URGENT") for k in (1, 2, 3, 4)]
    li = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
         d0 + dt.timedelta(days=5)),
        (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
         d0 + dt.timedelta(days=7)),
        (3, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
         d0 + dt.timedelta(days=9)),
        (4, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
         d0 + dt.timedelta(days=30)),
    ]
    _write(spark, out, "orders", orders, _ORDERS_SCHEMA)
    _write(
        spark, out, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate date",
    )
    r = QS["tpch_shipping_delay_profile"](spark, out).collect()
    assert len(r) == 1 and r[0]["month"] == "2024-01"
    # delays [5,7,9,30]: p50 rank (4+1)//2=2 -> 7; p90 rank 4 -> 30
    assert (r[0]["n"], r[0]["p50_delay"], r[0]["p90_delay"]) == (4, 7, 30)


def test_dropmalformed_over_arity_depends_on_parsed_columns(
    spark, tmp_path
):
    """Second pruning finding (found live via the empty-input
    harness): an OVER-arity line is judged malformed only when the
    plan parses the full schema — so collect() (full parse) drops it
    while a subset-column count keeps it, and the same DataFrame can
    answer show() and count() differently. scan_csv_dropmalformed's
    all-columns gate exists to kill this path dependence."""
    out = str(tmp_path)
    with open(os.path.join(out, "m.csv"), "w") as fh:
        fh.write("1,2.5,OK,surplus\n")
    read = (
        spark.read.schema("a BIGINT, b DOUBLE, c STRING")
        .option("mode", "DROPMALFORMED")
        .csv(out)
    )
    assert len(read.collect()) == 0       # full parse: malformed
    assert read.select("a", "c").count() == 1  # pruned parse: survives
