"""Inferential statistics over the fixture tables: closed-form OLS,
chi-square independence, two-sample Kolmogorov–Smirnov, Gini
concentration, IQR outlier gating, and lag-1 autocorrelation — the
hypothesis-testing tier a data-quality / drift-monitoring pipeline
layers above the descriptive profiles (profile_table, stats_median_mad).

Every statistic here is expressed as ordinary aggregates + bounded
broadcasts — one or two shuffles on the group key, no iteration, no
driver-side math — so each plan is the one you'd run at 100 TB. Exact
DuckDB oracles throughout (the statistics are deterministic given the
4-dp stable rounding of FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "stats_linear_regression",
    oracle="""
    SELECT l_returnflag,
           FLOOR(regr_slope(l_extendedprice, l_quantity) * 10000 + 0.5)
               / 10000 AS slope,
           FLOOR(regr_intercept(l_extendedprice, l_quantity) * 10000 + 0.5)
               / 10000 AS intercept,
           FLOOR(regr_r2(l_extendedprice, l_quantity) * 10000 + 0.5)
               / 10000 AS r2,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (price on quantity): slope =
    covar_pop/var_pop, intercept = ȳ − slope·x̄, r² = corr² — the
    moment identities DuckDB's regr_* family implements natively, so
    the oracle proves the composition. One partial-aggregable pass:
    every moment (sums, sums of squares, cross products) map-side
    combines, so the plan is a single shuffle of 5-number summaries
    per group regardless of data size. Rounded to 4 dp — the moments
    are summation-order-sensitive in the last ulps, the statistics are
    not at 4 dp (magnitudes ~1e3, relative noise ~1e-12).

    Degenerate groups mirror the SQL-standard regr_* semantics the
    oracle implements: constant x → NULL slope/intercept/r2 (ANSI
    Spark would otherwise raise DIVIDE_BY_ZERO — try_divide makes the
    NULL explicit); constant y under varying x → r2 = 1. r² is
    computed as cov²/(vx·vy) rather than corr² because Spark's corr
    itself divides by the zero variance."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.covar_pop("l_quantity", "l_extendedprice").alias("cxy"),
        F.var_pop("l_quantity").alias("vx"),
        F.var_pop("l_extendedprice").alias("vy"),
        F.avg("l_quantity").alias("mx"),
        F.avg("l_extendedprice").alias("my"),
        F.count(F.lit(1)).alias("n"),
    )
    slope = F.try_divide(F.col("cxy"), F.col("vx"))
    r2 = (
        F.when(F.col("vx") == 0, F.lit(None).cast("double"))
        .when(F.col("vy") == 0, F.lit(1.0))
        .otherwise(F.col("cxy") * F.col("cxy") / (F.col("vx") * F.col("vy")))
    )
    return agg.select(
        "l_returnflag",
        round4(slope).alias("slope"),
        round4(F.col("my") - slope * F.col("mx")).alias("intercept"),
        round4(r2).alias("r2"),
        "n",
    )


@query(
    "stats_chi_square",
    oracle="""
    WITH joined AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS prio
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    obs AS (SELECT seg, prio, COUNT(*) AS o FROM joined GROUP BY seg, prio),
    rt AS (SELECT seg, COUNT(*) AS r FROM joined GROUP BY seg),
    ct AS (SELECT prio, COUNT(*) AS c FROM joined GROUP BY prio),
    tot AS (SELECT COUNT(*) AS n FROM joined)
    SELECT FLOOR((SUM(CAST(o AS DOUBLE) * o * n / (CAST(r AS DOUBLE) * c))
                  - ANY_VALUE(n)) * 10000 + 0.5) / 10000 AS chi2,
           CAST(((SELECT COUNT(*) FROM rt) - 1)
                * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof
    FROM obs JOIN rt USING (seg) JOIN ct USING (prio) CROSS JOIN tot
    """,
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for market segment × order
    priority. Uses the algebraic identity χ² = Σ o²/e − N (e =
    row·col/N), which needs only the OBSERVED cells — empty cells
    contribute 0 to Σ o²/e and the −N absorbs their expected mass, so
    no dense cross-product of category domains is ever materialized.
    The contingency counts shuffle once on the pair key; the row/col
    marginals and N are tiny re-aggregations of those counts,
    broadcast back. Output is one fixed-width row at any scale."""
    j = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(F.col("c_mktsegment").alias("seg"),
                F.col("o_orderpriority").alias("prio"))
    )
    obs = j.groupBy("seg", "prio").agg(F.count(F.lit(1)).alias("o"))
    # marginals derived FROM the cell counts (no second scan of the join)
    rt = obs.groupBy("seg").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("prio").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    chi = (
        obs.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "prio")
        .crossJoin(F.broadcast(tot))
        .agg(
            round4(
                F.sum(
                    F.col("o").cast("double") * F.col("o") * F.col("n")
                    / (F.col("r").cast("double") * F.col("c"))
                )
                - F.any_value("n")
            ).alias("chi2")
        )
    )
    dof = (
        rt.agg(F.count(F.lit(1)).alias("nr"))
        .crossJoin(ct.agg(F.count(F.lit(1)).alias("nc")))
        .select(
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof")
        )
    )
    return chi.crossJoin(F.broadcast(dof))


@query(
    "stats_ks_two_sample",
    oracle="""
    WITH s AS (
        SELECT o_orderpriority AS prio, o_totalprice AS v,
               CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_o
        FROM orders WHERE o_orderstatus IN ('O', 'F')
    ),
    pts AS (
        SELECT prio, v, SUM(is_o) AS co, SUM(1 - is_o) AS cf
        FROM s GROUP BY prio, v
    ),
    tot AS (SELECT prio, CAST(SUM(is_o) AS BIGINT) AS n_o,
                   CAST(SUM(1 - is_o) AS BIGINT) AS n_f
            FROM s GROUP BY prio),
    cdf AS (
        SELECT prio,
               SUM(co) OVER (PARTITION BY prio ORDER BY v) AS ro,
               SUM(cf) OVER (PARTITION BY prio ORDER BY v) AS rf
        FROM pts
    )
    SELECT prio AS o_orderpriority,
           FLOOR(MAX(ABS(CAST(ro AS DOUBLE) / n_o
                         - CAST(rf AS DOUBLE) / n_f)) * 10000 + 0.5)
               / 10000 AS d_stat,
           ANY_VALUE(n_o) AS n_o, ANY_VALUE(n_f) AS n_f
    FROM cdf JOIN tot USING (prio)
    WHERE n_o > 0 AND n_f > 0
    GROUP BY prio
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic per order priority:
    do open ('O') and finished ('F') orders draw their totals from the
    same distribution? The empirical CDFs are evaluated at every
    DISTINCT value (group first — the window then orders a strictly
    increasing key, so no tiebreak is needed and frame membership is
    engine-independent), as running sums over one value-ordered window
    per group. The CDFs are ratios of exact integer counts, so both
    engines divide bit-identical operands; D is rounded at 4 dp only
    as a final guard. Two shuffles on the group key (distinct + sorted
    window); the sort parallelizes across the five priority groups."""
    s = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_totalprice").alias("v"),
            F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("is_o"),
        )
    )
    pts = s.groupBy("prio", "v").agg(
        F.sum("is_o").alias("co"), F.sum(1 - F.col("is_o")).alias("cf")
    )
    # KS is undefined when either sample is empty — drop such groups
    # BEFORE the cdf division (under ANSI Spark, /0 raises; DuckDB
    # would emit inf — neither is a statistic).
    tot = (
        s.groupBy("prio")
        .agg(
            F.sum("is_o").alias("n_o"), F.sum(1 - F.col("is_o")).alias("n_f")
        )
        .filter((F.col("n_o") > 0) & (F.col("n_f") > 0))
    )
    w = Window.partitionBy("prio").orderBy("v")
    cdf = pts.select(
        "prio",
        F.sum("co").over(w).alias("ro"),
        F.sum("cf").over(w).alias("rf"),
    )
    return (
        cdf.join(F.broadcast(tot), "prio")
        .groupBy(F.col("prio").alias("o_orderpriority"))
        .agg(
            round4(
                F.max(
                    F.abs(
                        F.col("ro").cast("double") / F.col("n_o")
                        - F.col("rf").cast("double") / F.col("n_f")
                    )
                )
            ).alias("d_stat"),
            F.any_value("n_o").alias("n_o"),
            F.any_value("n_f").alias("n_f"),
        )
    )


@query(
    "stats_gini_concentration",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority AS prio, o_totalprice AS v,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS i
        FROM orders
    )
    SELECT prio AS o_orderpriority,
           FLOOR((2.0 * SUM(i * v) / (COUNT(*) * SUM(v))
                  - (COUNT(*) + 1.0) / COUNT(*)) * 10000 + 0.5)
               / 10000 AS gini,
           COUNT(*) AS n
    FROM ranked GROUP BY prio
    """,
)
def stats_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order-value concentration per priority
    class, via the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    values ranked ascending. Σ(i·xᵢ) is invariant under permuting
    equal values (they contribute identical products whichever rank a
    tie takes), but the ORDER BY still carries o_orderkey so both
    engines assign a total order — hygiene, not a correctness need.
    One partitioned window (rank) + one groupBy on the same key: the
    sort parallelizes per group and the aggregate map-side combines."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("v"),
        F.row_number().over(w).alias("i"),
    )
    n = F.count(F.lit(1))
    return ranked.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        round4(
            2.0 * F.sum(F.col("i") * F.col("v")) / (n * F.sum("v"))
            - (n + 1.0) / n
        ).alias("gini"),
        n.alias("n"),
    )


@query(
    "quality_outlier_iqr",
    oracle="""
    WITH q AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS lo_q,
               quantile_cont(l_extendedprice, 0.75) AS hi_q
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           FLOOR(lo_q * 10000 + 0.5) / 10000 AS q1,
           FLOOR(hi_q * 10000 + 0.5) / 10000 AS q3,
           FLOOR((hi_q - lo_q) * 10000 + 0.5) / 10000 AS iqr,
           CAST(SUM(CASE WHEN l_extendedprice < lo_q - 1.5 * (hi_q - lo_q)
                           OR l_extendedprice > hi_q + 1.5 * (hi_q - lo_q)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l JOIN q USING (l_returnflag)
    GROUP BY l.l_returnflag, lo_q, hi_q
    """,
)
def quality_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per return flag: exact interpolated
    quartiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` — both
    the linear-interpolation definition over identical input doubles,
    hence bit-identical), IQR, and the count of rows outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR]. The fence comparison uses the RAW
    quartiles on both sides — identical derivations, identical
    decisions. Exact percentiles shuffle the group's values once; the
    3-row quartile table broadcasts back over a second scan. At
    100 TB the q-pass swaps to approx_percentile boundaries (the
    agg_approx_percentile path) without touching the fence logic."""
    li = table(spark, sf_dir, "lineitem")
    q = li.groupBy(F.col("l_returnflag").alias("qf")).agg(
        F.percentile("l_extendedprice", F.lit(0.25)).alias("q1"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (F.col("l_extendedprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("l_extendedprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        li.join(F.broadcast(q), F.col("l_returnflag") == F.col("qf"))
        .groupBy("l_returnflag")
        .agg(
            round4(F.any_value("q1")).alias("q1"),
            round4(F.any_value("q3")).alias("q3"),
            round4(F.any_value(iqr)).alias("iqr"),
            F.sum(F.when(out, 1).otherwise(0)).alias("n_outliers"),
        )
    )


@query(
    "stats_autocorr_daily",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               COUNT(*) AS n
        FROM events GROUP BY event_type, day
    ),
    lagged AS (
        SELECT event_type, n,
               lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
        FROM daily
    )
    SELECT event_type,
           FLOOR(corr(n, prev_n) * 10000 + 0.5) / 10000 AS autocorr_lag1,
           COUNT(prev_n) AS n_pairs
    FROM lagged GROUP BY event_type
    """,
)
def stats_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event count per event type —
    the burstiness/seasonality probe of a stream-health monitor.
    Daily counts roll up first (day-truncation also erases the ns-vs-µs
    fixture divergence, FIXTURES.md); lag pairs come from one
    day-ordered window per type (days are distinct after the rollup —
    strictly increasing order key, no tiebreak needed); corr is the
    single-pass moment aggregate. The lag is over OBSERVED days —
    calendar gaps pair across the gap identically in both engines.
    Everything shuffles on event_type only, and the windowed series is
    one row per day — bounded regardless of raw event volume."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "n", F.lag("n").over(w).alias("prev_n")
    )
    return lagged.groupBy("event_type").agg(
        round4(F.corr("n", "prev_n")).alias("autocorr_lag1"),
        F.count("prev_n").alias("n_pairs"),
    )


@query(
    "stats_t_test_welch",
    oracle="""
    WITH s AS (
        SELECT o_orderpriority AS prio,
               AVG(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS m1,
               var_samp(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)
                   AS v1,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n1,
               AVG(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS m2,
               var_samp(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)
                   AS v2,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n2
        FROM orders GROUP BY prio
    )
    SELECT prio AS o_orderpriority,
           FLOOR(((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) * 10000 + 0.5)
               / 10000 AS t_stat,
           FLOOR((power(v1 / n1 + v2 / n2, 2)
                  / (power(v1 / n1, 2) / (n1 - 1)
                     + power(v2 / n2, 2) / (n2 - 1))) * 10000 + 0.5)
               / 10000 AS dof,
           n1 AS n_o, n2 AS n_f
    FROM s WHERE n1 > 1 AND n2 > 1
    """,
)
def stats_t_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic (with Welch–Satterthwaite
    degrees of freedom) comparing open vs finished order totals per
    priority — the parametric sibling of stats_ks_two_sample. Both
    samples' moments come from ONE conditional-aggregate pass over the
    group (no per-status re-scan, no join); the statistic is row-local
    arithmetic on the 6-number summary. Groups where either sample has
    fewer than 2 observations carry no defined variance and are
    dropped, mirroring the KS empty-sample rule. Same formula text on
    both sides; the 4-dp round absorbs moment summation-order noise."""
    is_o = F.col("o_orderstatus") == "O"
    is_f = F.col("o_orderstatus") == "F"
    o = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    s = o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.avg(F.when(is_o, price)).alias("m1"),
        F.var_samp(F.when(is_o, price)).alias("v1"),
        F.count(F.when(is_o, 1)).alias("n1"),
        F.avg(F.when(is_f, price)).alias("m2"),
        F.var_samp(F.when(is_f, price)).alias("v2"),
        F.count(F.when(is_f, 1)).alias("n2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return (
        s.filter((F.col("n1") > 1) & (F.col("n2") > 1))
        .select(
            F.col("prio").alias("o_orderpriority"),
            round4((F.col("m1") - F.col("m2")) / F.sqrt(se2)).alias("t_stat"),
            round4(dof).alias("dof"),
            F.col("n1").alias("n_o"),
            F.col("n2").alias("n_f"),
        )
    )


@query(
    "stats_psi_drift",
    oracle="""
    WITH a AS (
        SELECT o_totalprice AS v FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    b AS (
        SELECT o_totalprice AS v FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    bounds AS (
        SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS t
        FROM a
    ),
    ca AS (
        SELECT 1 + len(list_filter(t, x -> v > x)) AS bucket,
               COUNT(*) AS c
        FROM a CROSS JOIN bounds GROUP BY bucket
    ),
    cb AS (
        SELECT 1 + len(list_filter(t, x -> v > x)) AS bucket,
               COUNT(*) AS c
        FROM b CROSS JOIN bounds GROUP BY bucket
    ),
    tot AS (SELECT (SELECT COUNT(*) FROM a) AS na,
                   (SELECT COUNT(*) FROM b) AS nb),
    g AS (
        SELECT CAST(COALESCE(ca.bucket, cb.bucket) AS INTEGER) AS bucket,
               (COALESCE(ca.c, 0) + 1.0) / (na + 10.0) AS pa,
               (COALESCE(cb.c, 0) + 1.0) / (nb + 10.0) AS pb
        FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
        CROSS JOIN tot
    )
    SELECT bucket,
           FLOOR(pa * 10000 + 0.5) / 10000 AS p_base,
           FLOOR(pb * 10000 + 0.5) / 10000 AS p_current,
           FLOOR(((pb - pa) * ln(pb / pa)) * 10000 + 0.5) / 10000
               AS psi_term
    FROM g
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a baseline period (orders
    before 1998) and the current one — the drift monitor every model
    scorecard runs. Decile boundaries come from the BASELINE's exact
    quantiles (one 1-row aggregate, broadcast); bucket assignment is a
    row-local lambda count over that 9-element array, so out-of-range
    current values clamp into the edge buckets naturally. Laplace
    (+1/+10) smoothing makes every per-bucket probability strictly
    positive — a PSI term is ln-undefined on an empty bucket, and an
    epsilon-free formulation would turn one empty decile into ±inf.
    Per-bucket terms are emitted (the report a dashboard plots); the
    scalar PSI is their sum. Probabilities are exact integer ratios;
    the single ln ulp is absorbed by the 4-dp round."""
    o = table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    a = o.filter(F.col("o_orderdate") < split).select(
        F.col("o_totalprice").alias("v")
    )
    b = o.filter(F.col("o_orderdate") >= split).select(
        F.col("o_totalprice").alias("v")
    )
    bounds = a.agg(
        F.percentile(
            F.col("v"),
            F.array(*[F.lit(i / 10) for i in range(1, 10)]),
        ).alias("t")
    )
    bucket = (
        1 + F.size(F.filter("t", lambda x: F.col("v") > x))
    ).alias("bucket")

    def counts(df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(bounds))
            .select(bucket)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    ca = counts(a).select(F.col("bucket").alias("ba"), F.col("c").alias("c_a"))
    cb = counts(b).select(F.col("bucket").alias("bb"), F.col("c").alias("c_b"))
    tot = a.agg(F.count(F.lit(1)).alias("na")).crossJoin(
        b.agg(F.count(F.lit(1)).alias("nb"))
    )
    g = (
        ca.join(cb, ca.ba == cb.bb, "full_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce("ba", "bb").cast("int").alias("bucket"),
            (
                (F.coalesce("c_a", F.lit(0)) + 1.0) / (F.col("na") + 10.0)
            ).alias("pa"),
            (
                (F.coalesce("c_b", F.lit(0)) + 1.0) / (F.col("nb") + 10.0)
            ).alias("pb"),
        )
    )
    return g.select(
        "bucket",
        round4(F.col("pa")).alias("p_base"),
        round4(F.col("pb")).alias("p_current"),
        round4((F.col("pb") - F.col("pa")) * F.log(F.col("pb") / F.col("pa"))).alias(
            "psi_term"
        ),
    )


@query(
    "stats_mann_whitney",
    oracle="""
    WITH s AS (
        SELECT value AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
        FROM events WHERE event_type IN ('click', 'view')
    ),
    vc AS (
        SELECT v, CAST(SUM(g1) AS BIGINT) AS n1v,
               COUNT(*) AS tv
        FROM s GROUP BY v
    ),
    ranked AS (
        SELECT v, n1v, tv,
               COALESCE(SUM(tv) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below
        FROM vc
    ),
    agg AS (
        SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
               CAST(SUM(tv - n1v) AS BIGINT) AS n2,
               SUM(n1v * (below + (tv + 1) / 2.0)) AS r1,
               SUM(CAST(tv AS DOUBLE) * tv * tv - tv) AS ties
        FROM ranked
    )
    SELECT n1, n2,
           r1 - n1 * (n1 + 1) / 2.0 AS u1,
           FLOOR(((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                  / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                         * ((n1 + n2 + 1)
                            - ties / (CAST(n1 + n2 AS DOUBLE)
                                      * (n1 + n2 - 1)))))
                 * 10000 + 0.5) / 10000 AS z
    FROM agg
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: are 'click' event values drawn
    from the same distribution as 'view' values? The naive formulation
    ranks every row through one global sort — a single-task cliff at
    scale. Instead the average rank of each DISTINCT value v is derived
    from counts: avgrank(v) = (#rows below v) + (tv+1)/2, so the only
    ordered pass runs over the distinct-value rollup (events.value is a
    2-dp bounded domain — O(distinct values) rows, not O(rows); the
    row-level work is one partial-aggregable groupBy). The rank sum
    R1 = Σ n1v·avgrank(v) is a sum of 0.5-multiples, exactly
    representable in doubles at any summation order, so U is
    hash-exact unrounded; the tie-corrected normal z takes the 4-dp
    stable round for its final sqrt/divide."""
    e = table(spark, sf_dir, "events")
    s = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
    )
    vc = s.groupBy("v").agg(
        F.sum("g1").cast("bigint").alias("n1v"),
        F.count(F.lit(1)).alias("tv"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vc.withColumn(
        "below", F.coalesce(F.sum("tv").over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum("n1v").cast("bigint").alias("n1"),
        F.sum(F.col("tv") - F.col("n1v")).cast("bigint").alias("n2"),
        F.sum(F.col("n1v") * (F.col("below") + (F.col("tv") + 1) / 2.0)).alias(
            "r1"
        ),
        F.sum(
            F.col("tv").cast("double") * F.col("tv") * F.col("tv") - F.col("tv")
        ).alias("ties"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    n = F.col("n1") + F.col("n2")
    sigma2 = (
        F.col("n1").cast("double") * F.col("n2") / 12.0
        * ((n + 1) - F.col("ties") / (n.cast("double") * (n - 1)))
    )
    z = (u1 - F.col("n1") * F.col("n2") / 2.0) / F.sqrt(sigma2)
    return agg.select(
        "n1", "n2", u1.alias("u1"), round4(z).alias("z")
    )


@query(
    "stats_spearman_by_group",
    oracle="""
    WITH spend AS (
        SELECT c_nationkey AS nk, c_custkey, c_acctbal AS x,
               COALESCE(SUM(o_totalprice), 0) AS y
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_nationkey, c_custkey, c_acctbal
    ),
    ranked AS (
        SELECT nk,
               RANK() OVER (PARTITION BY nk ORDER BY x)
                   + (COUNT(*) OVER (PARTITION BY nk, x) - 1) / 2.0 AS rx,
               RANK() OVER (PARTITION BY nk ORDER BY y)
                   + (COUNT(*) OVER (PARTITION BY nk, y) - 1) / 2.0 AS ry
        FROM spend
    ),
    m AS (
        SELECT nk, COUNT(*) AS n,
               SUM(rx * ry) AS sxy, SUM(rx) AS sx, SUM(ry) AS sy,
               SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
        FROM ranked GROUP BY nk
    )
    SELECT nk AS nationkey, CAST(n AS BIGINT) AS n,
           FLOOR(((n * sxy - sx * sy)
                  / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
                 * 10000 + 0.5) / 10000 AS rho
    FROM m WHERE (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
    """,
)
def stats_spearman_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Spearman rank correlation between a customer's
    account balance and their lifetime order spend — the monotonic
    (outlier-robust) twin of stats_linear_regression's Pearson tier.
    Average ranks for ties come from the standard identity
    rank() + (|ties|-1)/2 (two windows sharing one nation-key
    shuffle); ρ is then Pearson over the ranks via the moment formula,
    computed in the identical expression shape on both engines. Rank
    sums are 0.5-multiples (binary-exact at any summation order up to
    2^52), so at graded scale the statistic is deterministic before
    the 4-dp stable round; degenerate groups (zero rank variance)
    are filtered on both sides rather than emitting NULL/NaN."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_nationkey", "c_custkey", "c_acctbal")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0)).alias("y"))
        .select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_acctbal").alias("x"),
            "y",
        )
    )
    rx = (
        F.rank().over(Window.partitionBy("nk").orderBy("x"))
        + (F.count(F.lit(1)).over(Window.partitionBy("nk", "x")) - 1) / 2.0
    )
    ry = (
        F.rank().over(Window.partitionBy("nk").orderBy("y"))
        + (F.count(F.lit(1)).over(Window.partitionBy("nk", "y")) - 1) / 2.0
    )
    ranked = spend.select("nk", rx.alias("rx"), ry.alias("ry"))
    m = ranked.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    denom2 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        denom2
    )
    return m.filter(denom2 > 0).select(
        F.col("nk").alias("nationkey"),
        F.col("n").cast("bigint").alias("n"),
        round4(rho).alias("rho"),
    )


@query(
    "stats_wilson_ci",
    oracle="""
    WITH agg AS (
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey AS nationkey, n, pos,
           FLOOR((CAST(pos AS DOUBLE) / n) * 10000 + 0.5) / 10000 AS p_hat,
           FLOOR(((CAST(pos AS DOUBLE) / n + 1.9208 / n
                   - 1.96 * SQRT((CAST(pos AS DOUBLE) / n)
                                 * (1 - CAST(pos AS DOUBLE) / n) / n
                                 + 0.9604 / (n * n)))
                  / (1 + 3.8416 / n)) * 10000 + 0.5) / 10000 AS ci_lo,
           FLOOR(((CAST(pos AS DOUBLE) / n + 1.9208 / n
                   + 1.96 * SQRT((CAST(pos AS DOUBLE) / n)
                                 * (1 - CAST(pos AS DOUBLE) / n) / n
                                 + 0.9604 / (n * n)))
                  / (1 + 3.8416 / n)) * 10000 + 0.5) / 10000 AS ci_hi
    FROM agg
    """,
)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval for a per-group proportion (share of
    high-balance customers per nation, z = 1.96): the binomial CI that
    behaves at extreme p and small n, unlike the Wald interval that
    collapses to zero width at p ∈ {0, 1} — the per-segment
    conversion-rate readout (events_ab_test_analysis gives the
    two-arm z; this gives each arm's own uncertainty band). Everything
    is closed-form arithmetic over two BIGINT counts: +, ×, ÷ and one
    SQRT, all correctly-rounded IEEE ops, with the same literal
    constants (z² = 3.8416 folded) and parenthesization on both
    engines — bit-identical before the stable round even touches it.
    One map-side-combinable aggregate; O(groups) output."""
    c = table(spark, sf_dir, "customer")
    agg = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
    )
    n = F.col("n")
    p = F.col("pos").cast("double") / n
    half = 1.96 * F.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
    denom = 1 + 3.8416 / n
    return agg.select(
        F.col("c_nationkey").alias("nationkey"),
        "n",
        "pos",
        round4(p).alias("p_hat"),
        round4((p + 1.9208 / n - half) / denom).alias("ci_lo"),
        round4((p + 1.9208 / n + half) / denom).alias("ci_hi"),
    )


@query(
    "stats_kaplan_meier",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    cust AS (
        SELECT o_custkey,
               date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS dur,
               MAX(o_orderdate) AS last_d
        FROM orders GROUP BY o_custkey
    ),
    obs AS (
        SELECT dur,
               CASE WHEN last_d < maxd - INTERVAL 90 DAY THEN 1 ELSE 0 END
                   AS churned
        FROM cust CROSS JOIN mx
    ),
    tot AS (SELECT COUNT(*) AS n FROM obs),
    bydur AS (
        SELECT dur, CAST(SUM(churned) AS BIGINT) AS d,
               CAST(SUM(1 - churned) AS BIGINT) AS c
        FROM obs GROUP BY dur
    ),
    risk AS (
        SELECT dur, d, c,
               n - COALESCE(SUM(d + c) OVER (
                       ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS at_risk
        FROM bydur CROSS JOIN tot
    ),
    surv AS (
        SELECT dur, d, c, CAST(at_risk AS BIGINT) AS at_risk,
               SUM(CASE WHEN d = at_risk THEN 1 ELSE 0 END) OVER w
                   AS hit_zero,
               SUM(CASE WHEN d < at_risk AND d > 0
                        THEN ln(1 - CAST(d AS DOUBLE) / at_risk)
                        ELSE 0.0 END) OVER w AS logsum
        FROM risk
        WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT dur, d, c, at_risk,
           CASE WHEN hit_zero > 0 THEN 0.0
                ELSE FLOOR(exp(logsum) * 10000 + 0.5) / 10000
           END AS s
    FROM surv
    """,
)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimator with right-censoring — customer
    lifetime measured first-to-last order, an observation counted as a
    churn EVENT only if the customer's last order predates the
    dataset horizon by 90+ days (later actives are CENSORED, the
    correction naive churn averages get wrong). S(t) = Π(1 − dᵢ/nᵢ)
    over event times ≤ t, computed in log-space as a running sum
    (cumulative products have no window form), with the d = n
    terminal case routed around ln(0) by an explicit zero flag
    carried forward — NULLIF-into-SUM would silently SKIP the factor
    (SQL sums ignore NULL) and report survival rising after
    extinction. All windows run over the O(distinct durations)
    rollup, never per customer; the horizon is a live 1-row broadcast
    (text_tfidf class). ln/exp land inside the stable round."""
    o = table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    cust = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("dur"),
        F.max("o_orderdate").alias("last_d"),
    )
    obs = cust.crossJoin(F.broadcast(mx)).select(
        "dur",
        F.when(
            F.col("last_d") < F.date_sub(F.col("maxd"), 90), 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    tot = obs.agg(F.count(F.lit(1)).alias("n"))
    bydur = obs.groupBy("dur").agg(
        F.sum("churned").cast("bigint").alias("d"),
        F.sum(1 - F.col("churned")).cast("bigint").alias("c"),
    )
    wprev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = bydur.crossJoin(F.broadcast(tot)).withColumn(
        "at_risk",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)
            )
        ).cast("bigint"),
    )
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = risk.withColumn(
        "hit_zero",
        F.sum(
            F.when(F.col("d") == F.col("at_risk"), 1).otherwise(0)
        ).over(wcum),
    ).withColumn(
        "logsum",
        F.sum(
            F.when(
                (F.col("d") < F.col("at_risk")) & (F.col("d") > 0),
                F.log(1 - F.col("d").cast("double") / F.col("at_risk")),
            ).otherwise(0.0)
        ).over(wcum),
    )
    return surv.select(
        "dur",
        "d",
        "c",
        "at_risk",
        F.when(F.col("hit_zero") > 0, 0.0)
        .otherwise(round4(F.exp(F.col("logsum"))))
        .alias("s"),
    )


@query(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
               SUM(o_totalprice) AS s,
               SUM(o_totalprice * o_totalprice) AS ss
        FROM orders GROUP BY o_orderpriority
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS kk, SUM(s) AS st
        FROM g
    ),
    f AS (
        SELECT ANY_VALUE(kk) AS kk, ANY_VALUE(nn) AS nn,
               SUM(cnt * (s / cnt - st / nn) * (s / cnt - st / nn)) AS ssb,
               SUM(ss - s * s / cnt) AS ssw
        FROM g CROSS JOIN tot
    )
    SELECT kk AS k, nn AS n,
           CAST(kk - 1 AS BIGINT) AS df1, CAST(nn - kk AS BIGINT) AS df2,
           FLOOR((ssb / (kk - 1)) * 10000 + 0.5) / 10000 AS ms_between,
           FLOOR((ssw / (nn - kk)) * 10000 + 0.5) / 10000 AS ms_within,
           FLOOR(((ssb / (kk - 1)) / (ssw / (nn - kk))) * 10000 + 0.5)
               / 10000 AS f_stat
    FROM f
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic (order value across priority
    classes): between-group vs within-group variance from ONE
    moments pass — cnt/Σx/Σx² per group, then the closed-form
    decomposition SSB = Σ nᵍ(x̄ᵍ − x̄)², SSW = Σ(Σx² − (Σx)²/n).
    The k-sample generalization of stats_t_test_welch (k = 2 reduces
    to pooled-variance t²); F with its two dof is reported rather
    than a p-value — neither engine has an F CDF, and the dof pair
    is what a lookup needs. MEAN squares are reported, not raw
    SSB/SSW: the raw sums grow with the data (Σx² crossed 3·10¹⁵ at
    sf0.1) and overflow the stable round's LONG floor — the
    saturation bound documented in functions/rounding.py, found by
    THIS key's sf0.1 parity run; mean squares are per-dof, so they
    stay round-safe at any scale. Group state is O(k) and map-side
    combinable; the grand totals fold from the GROUP moments (the
    raw table is scanned exactly once); the one cross join is a
    1-row broadcast."""
    o = table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("o_totalprice").alias("s"),
        F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
    )
    tot = g.agg(
        F.sum("cnt").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
        F.sum("s").alias("st"),
    )
    gm = F.col("st") / F.col("nn")
    f = g.crossJoin(F.broadcast(tot)).agg(
        F.any_value(F.col("kk")).alias("kk"),
        F.any_value(F.col("nn")).alias("nn"),
        F.sum(
            F.col("cnt")
            * (F.col("s") / F.col("cnt") - gm)
            * (F.col("s") / F.col("cnt") - gm)
        ).alias("ssb"),
        F.sum(
            F.col("ss") - F.col("s") * F.col("s") / F.col("cnt")
        ).alias("ssw"),
    )
    return f.select(
        F.col("kk").alias("k"),
        F.col("nn").alias("n"),
        (F.col("kk") - 1).cast("bigint").alias("df1"),
        (F.col("nn") - F.col("kk")).cast("bigint").alias("df2"),
        round4(F.col("ssb") / (F.col("kk") - 1)).alias("ms_between"),
        round4(F.col("ssw") / (F.col("nn") - F.col("kk"))).alias(
            "ms_within"
        ),
        round4(
            (F.col("ssb") / (F.col("kk") - 1))
            / (F.col("ssw") / (F.col("nn") - F.col("kk")))
        ).alias("f_stat"),
    )


@query(
    "stats_theil_index",
    oracle="""
    WITH pos AS (
        SELECT c_nationkey, c_acctbal AS x FROM customer
        WHERE c_acctbal > 0
    ),
    mom AS (
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(x * ln(x)) AS sxlnx
        FROM pos GROUP BY c_nationkey
    )
    SELECT c_nationkey AS nationkey, n,
           FLOOR((sxlnx / sx - ln(sx / n)) * 10000 + 0.5) / 10000
               AS theil_t
    FROM mom WHERE n >= 2
    """,
)
def stats_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index per nation over positive balances —
    the entropy-based inequality measure that, unlike Gini
    (stats_gini_concentration), DECOMPOSES exactly into
    within-group + between-group terms, which is why inequality
    audits over hierarchies prefer it. The identity
    T = Σ(x/Σx)·ln(x/μ) = Σx·ln x / Σx − ln μ reduces the whole
    computation to TWO moment sums per group (Σx, Σx·ln x — map-side
    combinable, no rank window at all, versus Gini's ordered pass);
    T = 0 exactly for a perfectly equal group, ln n at maximal
    concentration. Positive-only domain is the estimator's own
    requirement (ln x), stated in the WHERE on both sides; the
    single-customer groups a log-moment can't characterize are
    dropped by the n >= 2 guard."""
    c = table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).select(
        "c_nationkey", F.col("c_acctbal").alias("x")
    )
    mom = pos.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.log(F.col("x"))).alias("sxlnx"),
    )
    return mom.filter(F.col("n") >= 2).select(
        F.col("c_nationkey").alias("nationkey"),
        "n",
        round4(
            F.col("sxlnx") / F.col("sx")
            - F.log(F.col("sx") / F.col("n"))
        ).alias("theil_t"),
    )


@query(
    "stats_fdr_bh",
    oracle="""
    WITH s AS (
        SELECT p_brand AS brand, l_quantity AS v,
               CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END AS is_a
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    pts AS (
        SELECT brand, v, SUM(is_a) AS ca, SUM(1 - is_a) AS cb
        FROM s GROUP BY brand, v
    ),
    tot AS (
        SELECT brand, CAST(SUM(is_a) AS BIGINT) AS n_a,
               CAST(SUM(1 - is_a) AS BIGINT) AS n_b
        FROM s GROUP BY brand
        HAVING SUM(is_a) > 0 AND SUM(1 - is_a) > 0
    ),
    cdf AS (
        SELECT brand,
               SUM(ca) OVER (PARTITION BY brand ORDER BY v) AS ra,
               SUM(cb) OVER (PARTITION BY brand ORDER BY v) AS rb
        FROM pts
    ),
    ks AS (
        SELECT brand,
               MAX(ABS(CAST(ra AS DOUBLE) / n_a
                       - CAST(rb AS DOUBLE) / n_b)) AS d,
               ANY_VALUE(n_a) AS n_a, ANY_VALUE(n_b) AS n_b
        FROM cdf JOIN tot USING (brand)
        GROUP BY brand
    ),
    pv AS (
        SELECT brand, d, n_a, n_b,
               LEAST(1.0, 2 * EXP(-2 * d * d
                   * (CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))) AS p
        FROM ks
    ),
    ranked AS (
        SELECT brand, d, n_a, n_b, p,
               ROW_NUMBER() OVER (ORDER BY p ASC, brand ASC) AS rk,
               COUNT(*) OVER () AS m
        FROM pv
    )
    SELECT brand, n_a, n_b,
           FLOOR(d * 10000 + 0.5) / 10000 AS d_stat,
           FLOOR(p * 10000 + 0.5) / 10000 AS p_value,
           rk,
           FLOOR(LEAST(1.0, MIN(p * m / rk) OVER (
                     ORDER BY rk DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 * 10000 + 0.5) / 10000 AS p_adj,
           LEAST(1.0, MIN(p * m / rk) OVER (
               ORDER BY rk DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               <= 0.1 AS reject
    FROM ranked
    """,
)
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg false-discovery-rate control over a family
    of per-brand two-sample tests — the multiple-comparisons step
    every metrics platform needs once it runs one hypothesis test per
    segment (25 brands here; thousands of segments in production,
    where ~5% of null segments would cross α=0.05 by chance alone).

    Per brand: the KS D statistic between the even- and odd-orderkey
    halves of l_quantity (the stats_ks_two_sample ECDF machinery —
    exact integer-count ratios), converted to a p-value with the
    standard large-sample Smirnov asymptotic
    p = min(1, 2·exp(−2·D²·n_a·n_b/(n_a+n_b))). Then the BH step-up:
    rank p ascending (brand tie-break), adjusted
    p_(i) = min_{j≥i} p_(j)·m/j as a reverse running MIN window,
    clamped to 1; reject at q = 0.10.

    Scale design: the heavy work (ECDF windows) partitions by brand
    and parallelizes across segments; the BH pass itself runs on the
    m-row test-summary relation — m = number of SEGMENTS, thousands
    at most, so the two global rank windows are bounded and cheap no
    matter the fact-table size. Doubles meet the engines only inside
    exp(); ordering collisions would need two p-values within one
    ulp, and exact ties (p clamped at 1.0) break on the brand key."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.col("l_quantity").alias("v"),
        F.when(F.col("l_orderkey") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    pts = s.groupBy("brand", "v").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    tot = (
        s.groupBy("brand")
        .agg(
            F.sum("is_a").alias("n_a"), F.sum(1 - F.col("is_a")).alias("n_b")
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    w = Window.partitionBy("brand").orderBy("v")
    cdf = pts.select(
        "brand",
        F.sum("ca").over(w).alias("ra"),
        F.sum("cb").over(w).alias("rb"),
    )
    ks = (
        cdf.join(F.broadcast(tot), "brand")
        .groupBy("brand")
        .agg(
            F.max(
                F.abs(
                    F.col("ra").cast("double") / F.col("n_a")
                    - F.col("rb").cast("double") / F.col("n_b")
                )
            ).alias("d"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    n_eff = F.col("n_a").cast("double") * F.col("n_b") / (
        F.col("n_a") + F.col("n_b")
    )
    pv = ks.withColumn(
        "p", F.least(F.lit(1.0), 2 * F.exp(-2 * F.col("d") * F.col("d") * n_eff))
    )
    wrank = Window.orderBy(F.col("p").asc(), F.col("brand").asc())
    ranked = pv.select(
        "brand",
        "d",
        "n_a",
        "n_b",
        "p",
        F.row_number().over(wrank).alias("rk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m"),
    )
    wrev = Window.orderBy(F.col("rk").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p_adj = F.least(
        F.lit(1.0), F.min(F.col("p") * F.col("m") / F.col("rk")).over(wrev)
    )
    return ranked.select(
        "brand",
        "n_a",
        "n_b",
        round4(F.col("d")).alias("d_stat"),
        round4(F.col("p")).alias("p_value"),
        "rk",
        round4(p_adj).alias("p_adj"),
        (p_adj <= 0.1).alias("reject"),
    )


def _perm_hash_sql(engine: str) -> str:
    """The cross-engine 60-bit md5 permutation gate (functions/dedup.py
    hash family): group assignment for user ``user_id`` in permutation
    ``b``."""
    from movierecommender_sentimentanalysissytem_spark.functions.dedup import (
        _duck_h,
        _spark_h,
    )

    h = _spark_h if engine == "spark" else _duck_h
    return (
        h("perm", "concat(CAST(user_id AS STRING), ':', CAST(b AS STRING))")
        + " % 2"
    )


@query(
    "stats_permutation_test",
    oracle=f"""
    WITH user_sums AS (
        SELECT user_id,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                   AS sv
        FROM events GROUP BY user_id
    ),
    obs AS (
        SELECT ABS(CAST(SUM(CASE WHEN user_id % 2 = 0 THEN sv END)
                        AS DOUBLE)
                   / COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END)
                 - CAST(SUM(CASE WHEN user_id % 2 = 1 THEN sv END)
                        AS DOUBLE)
                   / COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END))
                   AS stat_obs,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM user_sums
    ),
    perms AS (
        SELECT b.b, {_perm_hash_sql('duck')} AS g,
               u.sv
        FROM user_sums u
        CROSS JOIN (SELECT UNNEST(range(1, 100)) AS b) b
    ),
    perm_stats AS (
        SELECT b,
               ABS(CAST(SUM(CASE WHEN g = 0 THEN sv END) AS DOUBLE)
                   / COUNT(CASE WHEN g = 0 THEN 1 END)
                 - CAST(SUM(CASE WHEN g = 1 THEN sv END) AS DOUBLE)
                   / COUNT(CASE WHEN g = 1 THEN 1 END)) AS stat
        FROM perms
        GROUP BY b
        HAVING COUNT(CASE WHEN g = 0 THEN 1 END) > 0
           AND COUNT(CASE WHEN g = 1 THEN 1 END) > 0
    )
    SELECT o.n_users,
           FLOOR(o.stat_obs * 10000 + 0.5) / 10000 AS stat_obs_cents,
           CAST(COUNT(*) AS BIGINT) AS n_perm,
           CAST(SUM(CASE WHEN p.stat >= o.stat_obs THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ge,
           FLOOR((CAST(1 + SUM(CASE WHEN p.stat >= o.stat_obs
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                  / (1 + COUNT(*))) * 10000 + 0.5) / 10000 AS p_value
    FROM perm_stats p CROSS JOIN obs o
    GROUP BY o.n_users, o.stat_obs
    """,
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test (exact resampling, no distributional
    assumption): is the difference in mean per-user spend between the
    even- and odd-user_id cohorts explainable by chance? The null
    distribution comes from 99 DETERMINISTIC permutations — group
    reassignment by the engine's portable md5 hash of (user_id, b) —
    so the test is reproducible across reruns, partitionings, AND
    engines: the same hash family that drives sampling and LSH makes a
    Monte-Carlo procedure exactly SQL-checkable, which seeded RNG
    never is. p = (1 + #{stat_b ≥ stat_obs}) / (1 + B), the standard
    add-one estimate; degenerate permutations (a group emptied) are
    excluded from B.

    Exactness: per-user spend sums as integer CENTS (floor(value·100)
    per row — doubles never accumulate), each permutation statistic is
    |exact_sum/count − exact_sum/count|, so every stat_b ≥ stat_obs
    comparison is over bit-identical doubles and the p-value is an
    exact rational.

    Scale design: the fact table reduces to O(users) rows FIRST (one
    shuffle); the 99× fan-out explodes the compact user-sum relation,
    not the events, and re-aggregates with map-side combine on the
    99-group key. At 100 TB: events → user sums is the only wide pass;
    the permutation stage is O(users · B) rows, embarrassingly
    parallel, no state."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    user_sums = ev.groupBy("user_id").agg(F.sum(cents).alias("sv"))
    from movierecommender_sentimentanalysissytem_spark.plans.caching import (
        scoped_persist,
    )

    user_sums = scoped_persist(user_sums)

    def _stat(g: F.Column) -> F.Column:
        s0 = F.sum(F.when(g == 0, F.col("sv"))).cast("double")
        c0 = F.count(F.when(g == 0, 1))
        s1 = F.sum(F.when(g == 1, F.col("sv"))).cast("double")
        c1 = F.count(F.when(g == 1, 1))
        return F.abs(s0 / c0 - s1 / c1)

    obs = user_sums.agg(
        _stat(F.col("user_id") % 2).alias("stat_obs"),
        F.count(F.lit(1)).alias("n_users"),
    )
    perms = user_sums.crossJoin(
        F.broadcast(
            spark.range(1, 100).select(F.col("id").cast("int").alias("b"))
        )
    ).withColumn("g", F.expr(_perm_hash_sql("spark")))
    perm_stats = (
        perms.groupBy("b")
        .agg(
            _stat(F.col("g")).alias("stat"),
            F.count(F.when(F.col("g") == 0, 1)).alias("c0"),
            F.count(F.when(F.col("g") == 1, 1)).alias("c1"),
        )
        .filter((F.col("c0") > 0) & (F.col("c1") > 0))
    )
    return (
        perm_stats.crossJoin(F.broadcast(obs))
        .groupBy("n_users", "stat_obs")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perm"),
            F.sum(
                F.when(F.col("stat") >= F.col("stat_obs"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_ge"),
        )
        .select(
            "n_users",
            round4(F.col("stat_obs")).alias("stat_obs_cents"),
            "n_perm",
            "n_ge",
            round4(
                (1 + F.col("n_ge")).cast("double") / (1 + F.col("n_perm"))
            ).alias("p_value"),
        )
    )


def _pair_sign_sql(engine: str) -> str:
    """±1 sign for user ``user_id`` in paired permutation ``b`` — the
    same cross-engine 60-bit md5 gate as the unpaired test, under its
    own seed so the two tests' null draws are decorrelated."""
    from movierecommender_sentimentanalysissytem_spark.functions.dedup import (
        _duck_h,
        _spark_h,
    )

    h = _spark_h if engine == "spark" else _duck_h
    return (
        "(1 - 2 * ("
        + h("pairperm", "concat(CAST(user_id AS STRING), ':', CAST(b AS STRING))")
        + " % 2))"
    )


@query(
    "stats_permutation_test_paired",
    oracle=f"""
    WITH user_diffs AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN EXTRACT(DAY FROM ts) % 2 = 0
                             THEN CAST(FLOOR(value * 100) AS BIGINT)
                             ELSE -CAST(FLOOR(value * 100) AS BIGINT)
                        END) AS BIGINT) AS d
        FROM events GROUP BY user_id
    ),
    obs AS (
        SELECT ABS(CAST(SUM(d) AS DOUBLE) / COUNT(*)) AS stat_obs,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM user_diffs
    ),
    perms AS (
        SELECT b.b, u.d, {_pair_sign_sql('duck')} AS sgn
        FROM user_diffs u
        CROSS JOIN (SELECT UNNEST(range(1, 100)) AS b) b
    ),
    perm_stats AS (
        SELECT b, ABS(CAST(SUM(d * sgn) AS DOUBLE) / COUNT(*)) AS stat
        FROM perms GROUP BY b
    )
    SELECT o.n_users,
           FLOOR(o.stat_obs * 10000 + 0.5) / 10000 AS stat_obs_cents,
           CAST(COUNT(*) AS BIGINT) AS n_perm,
           CAST(SUM(CASE WHEN p.stat >= o.stat_obs THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ge,
           FLOOR((CAST(1 + SUM(CASE WHEN p.stat >= o.stat_obs
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                  / (1 + COUNT(*))) * 10000 + 0.5) / 10000 AS p_value
    FROM perm_stats p CROSS JOIN obs o
    GROUP BY o.n_users, o.stat_obs
    """,
)
def stats_permutation_test_paired(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Paired (sign-flip) permutation test — the within-subject sibling
    of stats_permutation_test: is each user's spend on even days of
    the month different from their spend on odd days? The paired
    design removes between-user variance entirely (every user is
    their own control), so the statistic is the mean of per-user
    DIFFERENCES and the null is generated by randomly flipping each
    difference's SIGN — the exchangeability assumption is within-user,
    which survives arbitrarily skewed user populations that would
    need huge B under the unpaired test. Signs come from the portable
    md5 hash of (user_id, b) under a dedicated seed, so all 99
    permutations are deterministic and the whole Monte-Carlo
    procedure is hash-exact cross-engine. No degenerate-permutation
    filter is needed: a sign flip never empties a group, so B is
    always exactly 99 (one structural difference from the unpaired
    key, where a permutation can empty a cohort).

    Exactness: per-user diffs are exact integer CENTS (each row
    enters as ±floor(value·100)); every permutation statistic is
    |exact_sum / n| — one double division per statistic, bit-identical
    both engines; p = (1 + #{stat_b ≥ stat_obs}) / (1 + B) exact.

    Scale design: identical to the unpaired key — events reduce to
    O(users) rows first (the only wide shuffle), the 99× fan-out
    explodes the compact diff relation with map-side combine on b. At
    100 TB the permutation stage is O(users · B) rows, stateless."""
    from movierecommender_sentimentanalysissytem_spark.plans.caching import (
        scoped_persist,
    )

    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    signed = F.when(F.dayofmonth("ts") % 2 == 0, cents).otherwise(-cents)
    user_diffs = scoped_persist(
        ev.groupBy("user_id").agg(F.sum(signed).alias("d"))
    )
    obs = user_diffs.agg(
        F.abs(F.sum("d").cast("double") / F.count(F.lit(1))).alias(
            "stat_obs"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    perms = user_diffs.crossJoin(
        F.broadcast(
            spark.range(1, 100).select(F.col("id").cast("int").alias("b"))
        )
    ).withColumn("sgn", F.expr(_pair_sign_sql("spark")))
    perm_stats = perms.groupBy("b").agg(
        F.abs(
            F.sum(F.col("d") * F.col("sgn")).cast("double")
            / F.count(F.lit(1))
        ).alias("stat")
    )
    return (
        perm_stats.crossJoin(F.broadcast(obs))
        .groupBy("n_users", "stat_obs")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perm"),
            F.sum(
                F.when(F.col("stat") >= F.col("stat_obs"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_ge"),
        )
        .select(
            "n_users",
            round4(F.col("stat_obs")).alias("stat_obs_cents"),
            "n_perm",
            "n_ge",
            round4(
                (1 + F.col("n_ge")).cast("double") / (1 + F.col("n_perm"))
            ).alias("p_value"),
        )
    )
