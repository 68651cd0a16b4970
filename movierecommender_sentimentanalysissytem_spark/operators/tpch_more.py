"""Second tranche of TPC-H query shapes (Q5, Q7, Q8, Q12, Q13, Q15,
Q19) — the join-graph, disjunctive-predicate, and agg-of-agg composites
the first tranche (operators/analytics.py) didn't cover. The fixture
has no partsupp / l_shipmode / l_commitdate, so those queries are
adapted the same way Q9/Q16/Q21 were: same plan shape, fixture columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.plans.caching import scoped_persist
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "tpch_q5_local_volume",
    oracle="""
    SELECT n_name AS nation,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000
               AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the cyclic join graph —
    supplier joins lineitem on l_suppkey AND customer on nationkey, so
    revenue only counts when the supplier sits in the customer's own
    nation. Catalyst plans the nationkey equality as an extra join
    conjunct on the already-broadcast supplier dim (no second shuffle);
    the region/nation dims broadcast; the one-year orderdate slice
    pushes to the orders scan for row-group pruning."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            round4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(strftime(l_shipdate, '%Y') AS INTEGER) AS l_year,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000
               AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): trade volume between an
    ordered PAIR of nations — the nation dim joins TWICE (supplier side
    and customer side) and the disjunctive pair filter correlates the
    two copies. Both nation copies broadcast; the pair predicate can't
    push below either single join, so Catalyst evaluates it at the
    last broadcast join — still zero extra shuffles over the plain
    fact⋈fact chain."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            round4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           FLOOR((SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE 0.0 END) / SUM(volume)) * 10000 + 0.5) / 10000
               AS mkt_share
    FROM (
        SELECT CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
    )
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of a
    region's volume in a part segment, per year — the widest join tree
    in the suite (7 tables, nation twice) feeding a conditional-
    aggregate ratio. Every dim broadcasts; both the numerator and
    denominator fold in ONE aggregation pass (no second scan); the
    share division happens after the 4 dp rounding contract."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .join(F.broadcast(r), F.col("rk2") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            round4(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): fact⋈fact
    join sliced to one ship year, with BOTH output measures as
    conditional sums over the joined row — the high/low priority
    split. The fixture lacks l_shipmode, so l_returnflag plays the
    line-attribute group key (same 3-way low-cardinality shape). The
    shipdate slice pushes to the lineitem scan; one shuffle for the
    join, a map-side-combinable 3-group aggregate after it."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): the count-of-
    counts histogram — a LEFT OUTER join with an extra non-key
    predicate INSIDE the join condition (so order-less customers still
    appear with count 0; a WHERE would drop them), aggregated twice.
    The first groupBy shuffles on c_custkey; the second input is
    |customers| rows of two ints, so its shuffle is negligible — the
    double-agg is effectively one-shuffle at any scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
                   / 10000 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): agg-of-agg — quarterly revenue
    per supplier, then the supplier(s) hitting the global max. The
    revenue relation is |suppliers|-bounded, so it's scope-persisted
    and reused for both the max (1-row broadcast) and the final
    equality filter — the fact table is scanned ONCE. Revenue is
    rounded to 4 dp on both sides BEFORE the max/equality so
    summation order can't break the tie set."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = scoped_persist(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            round4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("total_revenue")
        )
    )
    best = rev.agg(F.max("total_revenue").alias("best_rev"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q19_disjunctive_filter",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): an OR of three
    brand/size/quantity conjunctions straddling the join — the classic
    disjunctive-pushdown test. Catalyst factors the part-only
    disjuncts (brand ∈ {1,2,3}, size ≤ 15) below the join via CNF
    extraction, so the broadcast build side carries ~12% of parts and
    the residual OR evaluates only on surviving joined rows — at
    100 TB the difference between shipping every part into the hash
    table and shipping one-eighth of them."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            round4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               FLOOR(MIN(l_extendedprice / l_quantity) * 10000 + 0.5) / 10000
                   AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, s_name, n_name,
           FLOOR(s_acctbal * 10000 + 0.5) / 10000 AS s_acctbal, supplycost
    FROM part
    JOIN ps ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_size = 15
      AND supplycost = (
          SELECT MIN(ps2.supplycost)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN
    subquery over a derived part-supplier relation (the fixture lacks
    partsupp, so unit cost is MIN(l_extendedprice/l_quantity) per
    (part, supplier)). Decorrelated the Q17 way: instead of re-running
    the region-filtered join per part, ONE window MIN over l_partkey on
    the already-filtered candidates — the oracle keeps the literal
    correlated form to prove equivalence. Costs are rounded to 4 dp on
    both sides BEFORE the min/equality so the tie set is stable
    cross-engine. Two shuffles total: the (part,supp) aggregate and
    the window repartition on l_partkey."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        round4(F.min(F.col("l_extendedprice") / F.col("l_quantity"))).alias(
            "supplycost"
        )
    )
    eur_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps.join(F.broadcast(eur_sup), ps.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .withColumn("mincost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("mincost"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            round4(F.col("s_acctbal")).alias("s_acctbal"),
            "supplycost",
        )
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               FLOOR(SUM(l_extendedprice * l_quantity) * 10000 + 0.5) / 10000
                   AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM val
    WHERE value > (SELECT FLOOR(SUM(value) * 0.001 * 10000 + 0.5) / 10000
                   FROM val)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-key value
    vs a FRACTION of the global total — the scalar-subquery-in-HAVING
    composite. The per-part value relation is computed once
    (scope-persisted, |parts|-bounded), reused for the 1-row global
    threshold (broadcast cross join, never a driver collect) and the
    final filter. Supplier-nation filter broadcasts into the fact
    scan. Both sides round value AND threshold to 4 dp before the
    strict comparison (the Q22 boundary contract)."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    nat_sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    val = scoped_persist(
        li.join(F.broadcast(nat_sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            round4(F.sum(F.col("l_extendedprice") * F.col("l_quantity"))).alias(
                "value"
            )
        )
    )
    thr = val.agg(round4(F.sum("value") * 0.001).alias("thr"))
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("value") > F.col("thr"))
        .select("l_partkey", "value")
    )


@query(
    "tpch_q20_excess_suppliers",
    oracle="""
    WITH q AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM q JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND qty > (SELECT 0.5 * SUM(q2.qty) FROM q q2
                     WHERE q2.l_partkey = q.l_partkey))
    """,
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the nested
    semi-join — suppliers who shipped more than half of a promo part's
    one-year volume. The correlated share threshold decorrelates to a
    window SUM over l_partkey (one shuffle, co-partitioned with the
    (part,supp) aggregate that feeds it); the qualifying supplier keys
    gate the supplier dim via LEFT SEMI, preserving IN semantics
    without a distinct. l_quantity is integer-valued, so the sums and
    the 0.5× threshold are exact in both engines — no rounding needed
    for the strict comparison."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    q = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        q.join(F.broadcast(p), q.l_partkey == p.p_partkey)
        .withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           FLOOR(SUM(l_extendedprice) * 10000 + 0.5) / 10000 AS sum_base_price,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000
               AS sum_disc_price,
           FLOOR(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                 * 10000 + 0.5) / 10000 AS sum_charge,
           FLOOR(AVG(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty,
           FLOOR(AVG(l_extendedprice) * 10000 + 0.5) / 10000 AS avg_price,
           FLOOR(AVG(l_discount) * 10000 + 0.5) / 10000 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) verbatim on the fixture
    columns — completes the named 22-query TPC-H set alongside
    agg_groupby's reduced form. One scan with the ship-date predicate
    pushed to parquet, partial+final hash aggregation over a
    4-group key; the widest single-table aggregate in the engine."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        r4(F.sum("l_extendedprice")).alias("sum_base_price"),
        r4(F.sum(disc_price)).alias("sum_disc_price"),
        r4(F.sum(charge)).alias("sum_charge"),
        r4(F.avg("l_quantity")).alias("avg_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        r4(F.avg("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice * l_discount) * 10000 + 0.5) / 10000
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    filter-everything-then-one-sum query. All four predicates push to
    the parquet scan (year band, discount band, quantity cap), so the
    aggregate sees only qualifying rows — the purest pushdown showcase
    in the set. Discount comparisons are exact: both engines read the
    identical stored doubles."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        (
            F.floor(F.sum(F.col("l_extendedprice") * F.col("l_discount")) * 10000 + F.lit(0.5))
            / 10000
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_shipping_delay_profile",
    oracle="""
    WITH j AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               date_diff('day', o_orderdate, l_shipdate) AS delay,
               l_orderkey, l_linenumber
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    r AS (
        SELECT month, delay,
               ROW_NUMBER() OVER (
                   PARTITION BY month
                   ORDER BY delay, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY month) AS n
        FROM j
    )
    SELECT month, CAST(ANY_VALUE(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN delay END)
                AS BIGINT) AS p50_delay,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN delay END)
                AS BIGINT) AS p90_delay
    FROM r GROUP BY month
    """,
)
def tpch_shipping_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency profile: exact discrete p50/p90 of
    (l_shipdate − o_orderdate) per order month — the supply-chain SLA
    twin of events_conversion_latency_quantiles, over the JOINED
    fact pair instead of a single event stream. Delay is integer
    days and the percentile ranks are integer arithmetic
    ((n+1)//2, (9n+9)//10 — the agg_percentile_disc convention), so
    the whole result is BIGINT-exact with no rounding. Plan: one
    equi-join shuffle, then rank/count windows partitioned BY MONTH
    (never a global sort — ~80 balanced month partitions at any
    scale) feeding the final rollup on the same key."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.datediff("l_shipdate", "o_orderdate").alias("delay"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = Window.partitionBy("month").orderBy(
        "delay", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("month")
    r = j.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    r50 = F.floor((F.col("n") + 1) / 2)
    r90 = F.floor((9 * F.col("n") + 9) / 10)
    return r.groupBy("month").agg(
        F.any_value(F.col("n")).cast("bigint").alias("n"),
        F.max(F.when(F.col("rn") == r50, F.col("delay")))
        .cast("bigint")
        .alias("p50_delay"),
        F.max(F.when(F.col("rn") == r90, F.col("delay")))
        .cast("bigint")
        .alias("p90_delay"),
    )


@query(
    "tpch_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               SUM(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(revenue) AS t FROM rev),
    ranked AS (
        SELECT l_partkey, revenue,
               FLOOR((SUM(revenue) OVER (
                          ORDER BY revenue DESC, l_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) / t)
                     * 10000 + 0.5) / 10000 AS cum_share
        FROM rev CROSS JOIN tot
    )
    SELECT l_partkey,
           FLOOR(revenue * 10000 + 0.5) / 10000 AS revenue,
           cum_share,
           CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def tpch_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue,
    A = the head covering 80% of cumulative revenue, B = to 95%,
    C = the long tail — the standard working-capital cut, and the
    relational form of the "top-1% dominates" concentration story the
    Gini metric (rec_diversity_coverage) summarizes to one number.
    The cumulative window runs over the O(parts) DIMENSION rollup —
    bounded by catalog size, never by fact rows — with the part key
    as deterministic tie-break; the grand total arrives as a 1-row
    broadcast. Cumulative shares take the stable round BEFORE the
    0.8/0.95 class cuts so summation-order noise can't flip a
    boundary part's class."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    tot = rev.agg(F.sum("revenue").alias("t"))
    wcum = Window.orderBy(
        F.col("revenue").desc(), F.col("l_partkey").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = rev.crossJoin(F.broadcast(tot)).withColumn(
        "cum_share", round4(F.sum("revenue").over(wcum) / F.col("t"))
    )
    return ranked.select(
        "l_partkey",
        round4(F.col("revenue")).alias("revenue"),
        "cum_share",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "tpch_yoy_customer_growth",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               SUM(CASE WHEN o_orderdate >= DATE '1997-01-01'
                         AND o_orderdate < DATE '1998-01-01'
                        THEN o_totalprice ELSE 0.0 END) AS s97,
               SUM(CASE WHEN o_orderdate >= DATE '1998-01-01'
                         AND o_orderdate < DATE '1999-01-01'
                        THEN o_totalprice ELSE 0.0 END) AS s98
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey,
           FLOOR(s97 * 10000 + 0.5) / 10000 AS spend_97,
           FLOOR(s98 * 10000 + 0.5) / 10000 AS spend_98,
           FLOOR((s98 / NULLIF(s97, 0)) * 10000 + 0.5) / 10000
               AS growth_ratio,
           s97 > 0 AND s98 >= 2 * s97 AS doubled
    FROM per
    WHERE s97 > 0 OR s98 > 0
    """,
)
def tpch_yoy_customer_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer spend comparison (1997 vs 1998) with a
    'doubled' flag — the period-pivot shape (conditional aggregation
    per entity, NOT a self-join of two year slices, which would scan
    and shuffle orders twice) behind every growth-accounts report.
    New-in-98 customers surface with NULL growth_ratio (NULLIF
    denominator) and doubled = false (the s97 > 0 conjunct — growth
    from zero is undefined, not infinite); customers absent from both
    years drop out. The doubled flag compares UNROUNDED sums (2× is
    a structural bound, not a boundary near rounding noise); one
    scan, one shuffle on the entity key."""
    o = table(spark, sf_dir, "orders")
    in97 = (
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("date")
    ) & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    in98 = (
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")
    ) & (F.col("o_orderdate") < F.lit("1999-01-01").cast("date"))
    per = o.groupBy("o_custkey").agg(
        F.sum(F.when(in97, F.col("o_totalprice")).otherwise(0.0)).alias(
            "s97"
        ),
        F.sum(F.when(in98, F.col("o_totalprice")).otherwise(0.0)).alias(
            "s98"
        ),
    )
    return per.filter((F.col("s97") > 0) | (F.col("s98") > 0)).select(
        F.col("o_custkey").alias("custkey"),
        round4(F.col("s97")).alias("spend_97"),
        round4(F.col("s98")).alias("spend_98"),
        round4(F.col("s98") / F.nullif(F.col("s97"), F.lit(0.0))).alias(
            "growth_ratio"
        ),
        (
            (F.col("s97") > 0) & (F.col("s98") >= 2 * F.col("s97"))
        ).alias("doubled"),
    )
