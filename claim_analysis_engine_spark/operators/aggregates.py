"""Aggregations (SURVEY.md §2.5): monthly counts, KPI MoM, LOT alert,
lag stats, null profile, top-N, mode, histogram.

Float discipline for the oracle gate: money sums go through
DECIMAL(18,2) (exact, order-independent); averages/stddevs are rounded
to a fixed scale in BOTH engines so shuffle-order ulp drift can't flip
the value hash.

Scale notes: everything is one hash-aggregate exchange on the group
key; partial (map-side) aggregation is automatic. The month-level
rollups group on low-cardinality keys — at 100 TB the combine step
reduces each partition to a few thousand rows before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()


@REG.op(
    "agg_monthly_count",
    oracle="""
    SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_claims
    FROM orders GROUP BY 1, 2
    """,
)
def agg_monthly_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly group count — the substrate of every reference dashboard
    (groupby([...,'접수월_str']).size(); app.py:281,
    core/storage.py:558-560).

    r14 (guide §2.3, narrower types / per-group not per-row work):
    group on the TRUNCATED month timestamp (8-byte long key, integer
    math per row) and render the formatter string once per GROUP
    (~hundreds) instead of once per ROW (~150k date_format calls in
    the single-task scan stage). date_format(date_trunc(month, d)) ≡
    date_format(d) for 'yyyy-MM', so values are unchanged."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            "o_orderstatus",
            F.date_trunc("month", "o_orderdate").alias("_month_d"),
        )
        .agg(F.count(F.lit(1)).alias("n_claims"))
        .select(
            "o_orderstatus",
            F.date_format("_month_d", "yyyy-MM").alias("month"),
            "n_claims",
        )
    )


@REG.op(
    "agg_distinct_keys",
    oracle="""
    SELECT DISTINCT o_orderstatus AS status,
           year(o_orderdate) AS y, month(o_orderdate) AS m
    FROM orders
    """,
)
def agg_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct key combos (reference [플랜트,접수년,접수월]
    drop_duplicates, core/storage.py:331-351)."""
    return (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_orderstatus").alias("status"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .distinct()
    )


@REG.op(
    "agg_multi",
    oracle="""
    SELECT o_custkey, strftime(max(o_orderdate), '%Y-%m-%d') AS last_receipt,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate per group (reference agg(last_receipt=max,
    count=size), app.py:467-470)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_receipt"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@REG.op(
    "agg_sum_mean",
    oracle="""
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_amt,
           round(avg(o_totalprice), 4) AS avg_amt,
           count(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def agg_sum_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group sum/mean (reference monthly totals & share ratios,
    core/engine/trainer.py:71-73,103-108). Sum is decimal-exact."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_amt"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_amt"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@REG.op(
    "agg_topn_freq",
    oracle="""
    WITH freq AS (
      SELECT o_orderpriority AS category, count(*) AS n FROM orders GROUP BY 1
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM freq)
    SELECT category, n, round(100.0 * n / total, 2) AS pct
    FROM (
      SELECT *, row_number() OVER (ORDER BY n DESC, category ASC) AS rn FROM freq, tot
    ) WHERE rn <= 2
    """,
)
def agg_topn_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N categories by frequency with share pct (reference
    value_counts().head(2) + percentage, app.py:40-64).
    Ties broken by category name for determinism. The grand total is a
    broadcast 1-row aggregate (uniform scale-safe pattern — the rank
    window runs on the 5-row category frame only)."""
    freq = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("category"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = freq.agg(F.sum("n").alias("total"))
    w = W.orderBy(F.col("n").desc(), F.col("category").asc())
    return (
        freq.crossJoin(F.broadcast(total))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select(
            "category", "n", F.round(F.lit(100.0) * F.col("n") / F.col("total"), 2).alias("pct")
        )
    )


@REG.op(
    "agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
      SELECT o_orderstatus, o_orderpriority,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with pinned tie-break (reference 등급기준.mode()
    for the LOT card, app.py:495-498 — pandas mode tie is positional;
    here ties break on the value itself, SURVEY §7 determinism note)."""
    counted = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )


@REG.op(
    "agg_null_profile",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_dup_keys,
           CAST(count(*) - count(nullif(o_orderstatus, 'P')) AS BIGINT) AS n_null_status,
           round(100.0 * (count(*) - count(nullif(o_orderstatus, 'P'))) / count(*), 2)
             AS pct_null_status
    FROM orders
    """,
)
def agg_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile: rows, dup keys, per-column null counts
    (reference upload quality report, core/etl.py:74-102). Nulls
    synthesized via nullif since testdata is null-free."""
    df = load(spark, sf_dir, "orders").withColumn(
        "status_n", F.nullif("o_orderstatus", F.lit("P"))
    )
    n = F.count(F.lit(1))
    nulls = n - F.count("status_n")
    return df.agg(
        n.alias("n_rows"),
        (n - F.countDistinct("o_orderkey")).alias("n_dup_keys"),
        nulls.alias("n_null_status"),
        F.round(F.lit(100.0) * nulls / n, 2).alias("pct_null_status"),
    )


@REG.op(
    "agg_minmax_date",
    oracle="""
    SELECT strftime(min(o_orderdate), '%Y-%m') AS min_month,
           strftime(max(o_orderdate), '%Y-%m') AS max_month
    FROM orders
    """,
)
def agg_minmax_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max month — the series-mart spine bounds
    (core/storage.py:476-483)."""
    return load(spark, sf_dir, "orders").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("min_month"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM").alias("max_month"),
    )


@REG.op(
    "agg_kpi_mom",
    oracle="""
    WITH monthly AS (
      SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT *, lag(n) OVER (PARTITION BY o_orderstatus ORDER BY month) AS prev_n,
             max(month) OVER () AS max_month
      FROM monthly
    )
    SELECT o_orderstatus, month, n, prev_n,
           round(100.0 * (n - prev_n) / prev_n, 2) AS mom_pct
    FROM ranked WHERE month = max_month
    """,
)
def agg_kpi_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI + MoM delta: latest-month count per group vs prior month
    (reference MTD KPI w/ MoM pct, app.py:351-374). The global max
    month joins in as a broadcast 1-row aggregate — the per-group lag
    window stays partitioned by status."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            "o_orderstatus", F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    max_month = monthly.agg(F.max("month").alias("max_month"))
    ranked = monthly.withColumn(
        "prev_n", F.lag("n").over(W.partitionBy("o_orderstatus").orderBy("month"))
    ).crossJoin(F.broadcast(max_month))
    return ranked.where(F.col("month") == F.col("max_month")).select(
        "o_orderstatus",
        "month",
        "n",
        "prev_n",
        F.round(F.lit(100.0) * (F.col("n") - F.col("prev_n")) / F.col("prev_n"), 2).alias(
            "mom_pct"
        ),
    )


@REG.op(
    "flt_partial_period",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('month', max(o_orderdate)) AS cur_start,
             max(o_orderdate) AS mx,
             day(max(o_orderdate)) AS cutoff_day
      FROM orders
    )
    SELECT count(*) FILTER (
             o_orderdate >= cur_start AND o_orderdate <= mx) AS cur_mtd,
           count(*) FILTER (
             o_orderdate >= cur_start - INTERVAL 1 MONTH
             AND o_orderdate < cur_start
             AND day(o_orderdate) <= cutoff_day) AS prev_same_window
    FROM orders, bounds
    """,
)
def flt_partial_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-period compare: current MTD vs prior-month same-day window
    (reference app.py:343-353, clamped to month length)."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.max("o_orderdate")).alias("cur_start"),
        F.max("o_orderdate").alias("mx"),
        F.dayofmonth(F.max("o_orderdate")).alias("cutoff_day"),
    )
    joined = orders.join(F.broadcast(bounds))
    cur = (F.col("o_orderdate") >= F.col("cur_start")) & (
        F.col("o_orderdate") <= F.col("mx")
    )
    prev = (
        (F.col("o_orderdate") >= F.add_months(F.col("cur_start"), -1))
        & (F.col("o_orderdate") < F.col("cur_start"))
        & (F.dayofmonth("o_orderdate") <= F.col("cutoff_day"))
    )
    return joined.agg(
        F.count(F.when(cur, 1)).alias("cur_mtd"),
        F.count(F.when(prev, 1)).alias("prev_same_window"),
    )


@REG.op(
    "agg_lot_alert",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_suppkey, CAST(l_shipdate AS DATE) AS ship_date
      FROM lineitem
    ), mx AS (SELECT max(ship_date) AS mx FROM li)
    SELECT l_partkey, l_suppkey, count(*) AS n_hits,
           strftime(max(ship_date), '%Y-%m-%d') AS last_ship
    FROM li, mx
    WHERE ship_date >= mx.mx - INTERVAL 30 DAY
    GROUP BY l_partkey, l_suppkey
    HAVING count(*) >= 3
    """,
)
def agg_lot_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOT-style alert: ≥3 hits on the same (part, supplier) within the
    trailing 30 days, with last occurrence (reference LOT alert
    groupby count>=3 in last 30d, app.py:446-472)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_shipdate").cast("date").alias("ship_date")
    )
    mx = li.agg(F.date_sub(F.max("ship_date"), 30).alias("cutoff"))
    return (
        li.join(F.broadcast(mx))
        .where(F.col("ship_date") >= F.col("cutoff"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_hits"),
             F.date_format(F.max("ship_date"), "yyyy-MM-dd").alias("last_ship"))
        .where(F.col("n_hits") >= 3)
    )


@REG.op(
    "agg_lag_stats",
    oracle="""
    WITH lag AS (
      SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT count(*) AS n, round(avg(lag_days), 4) AS mean_lag,
           round(median(lag_days), 1) AS median_lag,
           CAST(min(lag_days) AS BIGINT) AS min_lag,
           CAST(max(lag_days) AS BIGINT) AS max_lag,
           round(stddev_samp(lag_days), 4) AS std_lag
    FROM lag WHERE lag_days >= 0
    """,
)
def agg_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag distribution stats: count/mean/median/min/max/std of
    ship-minus-order days where valid (reference Lag_Days stats,
    core/analytics.py:391-408; lag derivation core/etl.py:259-265).

    EXACT median without a serial sort: lag_days has a small bounded
    domain (whole days, ~0-120), so the stats reduce over a per-value
    histogram — groupBy(lag_days) map-side-combines to ≤|domain| rows
    per partition, and the median comes from the cumulative histogram
    (the window below orders ~120 rows, not 600k values through one
    reduce task, which is what a global F.median costs). Mean/std
    derive from exact integer moment sums, so no float fold-order
    drift against the oracle either."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("lag_days"))
        .where(F.col("lag_days") >= 0)
    )
    hist = lag.groupBy("lag_days").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.orderBy("lag_days").rowsBetween(W.unboundedPreceding, 0)
    # r14 (guide §2.4/§7.2): the grand total used to come from a
    # separate `h.agg(...)` branch crossJoined back — a second full
    # subtree that AQE did NOT dedupe (the before-plan shows TWO
    # lineitem⋈orders passes: operators (1)-(10) and (14)-(23) in
    # plans/r14/agg_lag_stats_before.txt). A second frame over the SAME
    # single-partition window computes n_all in the one Window node the
    # cumulative sum already pays for — the join+histogram now executes
    # once. The window moves ≤|lag domain| (~120) rows, not 600k.
    w_all = W.orderBy("lag_days").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    h2 = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_all", F.sum("cnt").over(w_all)
    )
    sum1 = F.sum(F.col("cnt") * F.col("lag_days"))
    sum2 = F.sum(F.col("cnt") * F.col("lag_days") * F.col("lag_days"))
    # exact median from the cumulative histogram: the two middle ranks
    # (equal for odd n) are floor((n+1)/2) and floor(n/2)+1
    m1 = F.min(
        F.when(F.col("cum") >= F.floor((F.col("n_all") + 1) / 2), F.col("lag_days"))
    )
    m2 = F.min(
        F.when(F.col("cum") >= F.floor(F.col("n_all") / 2) + 1, F.col("lag_days"))
    )
    return h2.agg(
        F.max("n_all").alias("n"),
        F.round(sum1.cast("double") / F.max("n_all"), 4).alias("mean_lag"),
        F.round((m1 + m2) / 2.0, 1).alias("median_lag"),
        F.min("lag_days").alias("min_lag"),
        F.max("lag_days").alias("max_lag"),
        F.round(
            F.sqrt(
                (
                    sum2.cast("double")
                    - sum1.cast("double") * sum1.cast("double") / F.max("n_all")
                )
                / (F.max("n_all") - 1)
            ),
            4,
        ).alias("std_lag"),
    )


@REG.op(
    "agg_hist",
    oracle="""
    SELECT CAST(floor(l_quantity) AS INT) AS bucket, count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def agg_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram via bucketed group-count (reference 50-bin lag
    histogram, pages/3_플랜트_분석.py:639-641). Bucketing is a pure
    projection, so the exchange carries ≤ n_buckets rows/partition."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.floor("l_quantity").cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@REG.op(
    "detect_outliers_iqr",
    oracle="""
    WITH monthly AS (
      SELECT o_orderstatus AS status, strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    fences AS (
      SELECT status,
             quantile_cont(n, 0.25) AS q1, quantile_cont(n, 0.75) AS q3
      FROM monthly GROUP BY 1
    )
    SELECT m.status, m.month, m.n,
           round(f.q1 - 1.5 * (f.q3 - f.q1), 6) AS lo_fence,
           round(f.q3 + 1.5 * (f.q3 - f.q1), 6) AS hi_fence,
           CASE WHEN m.n < round(f.q1 - 1.5 * (f.q3 - f.q1), 6)
                  OR m.n > round(f.q3 + 1.5 * (f.q3 - f.q1), 6)
                THEN true ELSE false END AS is_outlier
    FROM monthly m JOIN fences f ON f.status = m.status
    """,
)
def detect_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier flags on the per-plant monthly claim series — the
    reference's documented-but-never-implemented detect_outliers_iqr
    (docs/project_master.md:20; the latent import at
    pages/3_플랜트_분석.py:21 would raise ImportError if the page ever
    called it). Per group: exact Q1/Q3 (linear-interpolated, matching
    quantile_cont), Tukey fences at 1.5·IQR, and a boolean flag per
    month. Fences round to 6 dp BEFORE comparison on both engines so a
    ulp of quantile drift can't flip a point sitting on a fence.
    Scale: the fence frame is |groups| rows — broadcast back onto the
    monthly series; exact percentile over months-per-group (~hundreds)
    is cheap, and percentile_approx is the swap if groups ever carry
    millions of points."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fences = monthly.groupBy("status").agg(
        F.percentile("n", F.lit(0.25)).alias("q1"),
        F.percentile("n", F.lit(0.75)).alias("q3"),
    )
    lo = F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 6)
    hi = F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 6)
    return monthly.join(F.broadcast(fences), "status").select(
        "status",
        "month",
        "n",
        lo.alias("lo_fence"),
        hi.alias("hi_fence"),
        ((F.col("n") < lo) | (F.col("n") > hi)).alias("is_outlier"),
    )


@REG.op(
    "detect_outliers_zscore",
    oracle="""
    WITH monthly AS (
      SELECT o_orderstatus AS status, strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    stats AS (
      SELECT status, avg(n) AS mu, stddev_samp(n) AS sigma
      FROM monthly GROUP BY 1
    )
    SELECT m.status, m.month, m.n,
           round((m.n - s.mu) / nullif(s.sigma, 0), 4) AS z,
           CASE WHEN abs(round((m.n - s.mu) / nullif(s.sigma, 0), 4)) > 3.0
                THEN true ELSE false END AS is_outlier
    FROM monthly m JOIN stats s ON s.status = m.status
    """,
)
def detect_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flags — the other half of the reference's
    documented outlier surface (docs/project_master.md:20: "IQR or
    Z-Score"): per-group mean/std of the monthly series, |z| > 3 flags
    a spike. Degenerate groups (one month, or zero variance) yield
    NULL z and flag false on both engines. Same broadcast-stats shape
    as the IQR variant."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = monthly.groupBy("status").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = F.round(
        (F.col("n") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0)), 4
    )
    return monthly.join(F.broadcast(stats), "status").select(
        "status",
        "month",
        "n",
        z.alias("z"),
        F.when(F.abs(z) > 3.0, True).otherwise(False).alias("is_outlier"),
    )


@REG.op(
    "agg_window_profile",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag,
             strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
             count(*) AS n
      FROM lineitem WHERE year(l_shipdate) BETWEEN 1996 AND 1997
      GROUP BY 1, 2
    )
    SELECT flag, month, n,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume,
           CAST(lag(n) OVER w AS BIGINT) AS prev_n,
           CAST(lead(n) OVER w AS BIGINT) AS next_n
    FROM m
    WINDOW w AS (PARTITION BY flag ORDER BY n, month)
    """,
)
def agg_window_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window breadth in one op: rank / ntile / percent_rank /
    cume_dist / lag / lead over per-flag monthly counts — the analytic
    window family §2.5's aggregates don't exercise. The order key is
    (n, month) so ties can't make rank or ntile engine-dependent. One
    hash aggregate then one window exchange on the small grouped frame
    (|flags| × |months| rows — the window never sees raw lineitem)."""
    m = (
        load(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate").between(1996, 1997))
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("flag").orderBy("n", "month")
    return m.select(
        "flag",
        "month",
        "n",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.lag("n").over(w).cast("bigint").alias("prev_n"),
        F.lead("n").over(w).cast("bigint").alias("next_n"),
    )


# --------------------------------------------------- agg_kanon_suppress

KANON_K = 20  # minimum group size an exported aggregate row may reveal


@REG.op(
    "agg_kanon_suppress",
    oracle=f"""
    WITH g AS (
      SELECT n_name AS nation, c_mktsegment AS segment, count(*) AS n,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_bal
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1, 2
    ),
    marked AS (SELECT *, n >= {KANON_K} AS keep FROM g)
    SELECT nation, segment, n, total_bal, FALSE AS suppressed
    FROM marked WHERE keep
    UNION ALL
    SELECT nation, 'OTHER' AS segment,
           CAST(sum(n) AS BIGINT) AS n,
           round(sum(total_bal), 2) AS total_bal,
           TRUE AS suppressed
    FROM marked WHERE NOT keep
    GROUP BY nation
    """,
)
def agg_kanon_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression for published aggregates — the release
    gate a data-sharing pipeline applies before any per-segment table
    leaves the boundary: groups smaller than k (here 20) would let a
    reader triangulate individuals, so they are folded into a
    per-nation 'OTHER' bucket whose totals stay accurate while no
    emitted row describes fewer than k people (unless even the fold is
    small — which the `suppressed` flag makes auditable). One grouped
    aggregate plus one re-aggregate of ONLY the small groups; the
    broadcast nation dim joins before the aggregate so grouping runs
    on the joined key directly. Decimal sums keep the folded totals
    exactly equal to the sum of their parts."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation")
    )
    g = (
        c.join(F.broadcast(n), "c_nationkey")
        .groupBy("nation", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_bal"),
        )
    )
    kept = g.where(F.col("n") >= KANON_K).withColumn("suppressed", F.lit(False))
    folded = (
        g.where(F.col("n") < KANON_K)
        .groupBy("nation")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total_bal"), 2).alias("total_bal"),
        )
        .select(
            "nation",
            F.lit("OTHER").alias("segment"),
            "n",
            "total_bal",
            F.lit(True).alias("suppressed"),
        )
    )
    return kept.unionByName(folded)


# ---------------------------------------------------- dq_expectations

DQ_MAX_VIOLATION_PCT = 0.0  # every declared rule must hold exactly


@REG.op(
    "dq_expectations",
    oracle="""
    WITH checks AS (
      SELECT count(*) AS n_rows,
             count(*) - count(o_orderkey) AS v_key_null,
             -- dup rule counts only NON-NULL keys: a null key is
             -- key_not_null's violation, not a duplicate
             count(o_orderkey) - count(DISTINCT o_orderkey) AS v_key_dup,
             count(*) FILTER (o_totalprice <= 0) AS v_price_pos,
             count(*) FILTER (month(o_orderdate) < 1
                              OR month(o_orderdate) > 12) AS v_month_range,
             count(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P'))
               AS v_status_domain,
             count(*) FILTER (o_orderdate < DATE '1990-01-01'
                              OR o_orderdate > DATE '2030-12-31')
               AS v_date_bounds
      FROM orders
    )
    SELECT r.rule, r.n_violations, c.n_rows AS n_checked,
           r.n_violations = 0 AS pass
    FROM checks c, LATERAL (VALUES
      ('key_not_null',  CAST(c.v_key_null AS BIGINT)),
      ('key_unique',    CAST(c.v_key_dup AS BIGINT)),
      ('price_positive', CAST(c.v_price_pos AS BIGINT)),
      ('month_in_range', CAST(c.v_month_range AS BIGINT)),
      ('status_in_domain', CAST(c.v_status_domain AS BIGINT)),
      ('date_in_bounds', CAST(c.v_date_bounds AS BIGINT))
    ) AS r(rule, n_violations)
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations evaluated in ONE pass —
    the contract gate a 100 TB ingest runs before publishing a batch
    (the Deequ/expectations pattern), extending the reference's upload
    quality report (core/etl.py:74-102) from counts to named
    pass/fail rules: key completeness + uniqueness, value positivity,
    calendar range, categorical domain, date sanity. Every row-level
    rule is a conditional count inside ONE aggregate (map-side
    combinable; zero extra scans however many rules are declared);
    uniqueness rides the same pass as a distinct count. The result
    unpivots to one row per rule so downstream alerting/selection is
    relational — and the oracle re-derives every rule's violation
    count independently. The testdata is clean, so the oracle shows
    all-pass; tests/test_etl_invariants.py plants every violation
    class in a dirty frame and asserts each rule fires."""
    return dq_check(load(spark, sf_dir, "orders"))


def dq_check(o: DataFrame) -> DataFrame:
    """The expectations evaluator itself, over any orders-shaped frame
    (separated from the op so tests can feed it dirty data)."""
    n = F.count(F.lit(1))

    def violations(cond: F.Column) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    checks = o.agg(
        n.alias("n_rows"),
        (n - F.count("o_orderkey")).alias("v_key_null"),
        (F.count("o_orderkey") - F.countDistinct("o_orderkey")).alias("v_key_dup"),
        violations(F.col("o_totalprice") <= 0).alias("v_price_pos"),
        violations(
            (F.month("o_orderdate") < 1) | (F.month("o_orderdate") > 12)
        ).alias("v_month_range"),
        violations(~F.col("o_orderstatus").isin("F", "O", "P")).alias(
            "v_status_domain"
        ),
        violations(
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("date"))
            | (F.col("o_orderdate") > F.lit("2030-12-31").cast("date"))
        ).alias("v_date_bounds"),
    )
    rules = [
        ("key_not_null", "v_key_null"),
        ("key_unique", "v_key_dup"),
        ("price_positive", "v_price_pos"),
        ("month_in_range", "v_month_range"),
        ("status_in_domain", "v_status_domain"),
        ("date_in_bounds", "v_date_bounds"),
    ]
    long = checks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(col).cast("bigint").alias("n_violations"),
                        F.col("n_rows").alias("n_checked"),
                    )
                    for name, col in rules
                ]
            )
        ).alias("r")
    )
    return long.select(
        "r.rule",
        "r.n_violations",
        "r.n_checked",
        (F.col("r.n_violations") == 0).alias("pass"),
    )


# ----------------------------------------------------- dq_referential

@REG.op(
    "dq_referential",
    oracle="""
    SELECT fk, n_child, n_orphans, n_orphans = 0 AS pass FROM (
      SELECT 'orders.o_custkey->customer' AS fk,
             (SELECT count(*) FROM orders) AS n_child,
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)) AS n_orphans
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey))
    ) t
    """,
)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity expectations — the cross-TABLE dq class
    dq_expectations (single-table, one-pass) cannot express: each
    declared foreign-key edge is checked for orphans with a left_anti
    join against the parent's keys. Three edges cover the star schema's
    spine (orders→customer, lineitem→orders, lineitem→part).

    Scale shape: anti-join on the join key — Spark picks broadcast
    when the parent key set fits (customer/part dims) and a shuffled
    hash join otherwise; either way each edge is one pass over the
    child, never a per-row lookup, and the three edges share no state
    so they parallelize as independent jobs. tests/test_etl_invariants
    plants orphans in each edge and asserts the exact counts fire."""
    fks = [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ]
    out = None
    for fk, child_t, ck, parent_t, pk in fks:
        frame = fk_orphans(
            load(spark, sf_dir, child_t), ck, load(spark, sf_dir, parent_t), pk, fk
        )
        out = frame if out is None else out.unionByName(frame)
    return out


def fk_orphans(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, fk: str
) -> DataFrame:
    """One FK edge's orphan check (separated so tests can feed dirty
    frames): child rows whose key has no parent row."""
    orphans = child.select(F.col(child_key).alias("k")).join(
        parent.select(F.col(parent_key).alias("k")).distinct(), "k", "left_anti"
    )
    return child.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
        F.broadcast(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
    ).select(
        F.lit(fk).alias("fk"),
        "n_child",
        "n_orphans",
        (F.col("n_orphans") == 0).alias("pass"),
    )


# ------------------------------------------------------- dq_psi_drift

PSI_REF_YEAR = 1997
PSI_CUR_YEAR = 2000
PSI_BINS = 10
PSI_EPS = 1e-6  # proportion smoothing: empty bins must not blow up ln()


@REG.op(
    "dq_psi_drift",
    oracle=f"""
    WITH ref AS (
      SELECT o_totalprice AS v FROM orders
      WHERE year(o_orderdate) = {PSI_REF_YEAR}
    ),
    cur AS (
      SELECT o_totalprice AS v FROM orders
      WHERE year(o_orderdate) = {PSI_CUR_YEAR}
    ),
    edges AS (
      SELECT min(v) AS lo, (max(v) - min(v)) / {PSI_BINS} AS w FROM ref
    ),
    rh AS (
      SELECT least(greatest(CAST(floor((v - lo) / w) AS BIGINT), 0),
                   {PSI_BINS - 1}) AS bin, count(*) AS n
      FROM ref, edges GROUP BY 1
    ),
    ch AS (
      SELECT least(greatest(CAST(floor((v - lo) / w) AS BIGINT), 0),
                   {PSI_BINS - 1}) AS bin, count(*) AS n
      FROM cur, edges GROUP BY 1
    ),
    spine AS (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin),
    p AS (
      SELECT s.bin,
             CAST(coalesce(rh.n, 0) AS BIGINT) AS n_ref,
             CAST(coalesce(ch.n, 0) AS BIGINT) AS n_cur,
             coalesce(rh.n, 0) / (SELECT CAST(count(*) AS DOUBLE) FROM ref)
               + {PSI_EPS} AS p_ref,
             coalesce(ch.n, 0) / (SELECT CAST(count(*) AS DOUBLE) FROM cur)
               + {PSI_EPS} AS p_cur
      FROM spine s
      LEFT JOIN rh ON rh.bin = s.bin
      LEFT JOIN ch ON ch.bin = s.bin
    )
    SELECT bin, n_ref, n_cur,
           round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
           round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
    FROM p
    """,
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tabular feature-drift monitor: the population stability index of
    o_totalprice between a reference window (orders of {PSI_REF_YEAR})
    and a current window ({PSI_CUR_YEAR}), per fixed bin — the
    standard go/no-go check before a model trained on the reference
    period scores current data (the tabular sibling of
    emb_drift_monitor's embedding-space check). Bin edges derive from
    the REFERENCE window's min/max (10 equal-width bins, outliers
    clamped to the edge bins), so drift moves the CURRENT histogram
    against frozen edges instead of silently re-binning both sides;
    epsilon-smoothed proportions keep empty bins finite. Consumers sum
    psi_term (>0.2 = actionable drift by the usual rule of thumb).

    Scale shape: two filtered single-pass histograms (map-side
    combinable conditional aggregates), a 10-row bin spine join, and
    per-bin scalar math — no shuffle larger than the bin count, so the
    check costs two scans of the monitored column at any corpus
    size."""
    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"), F.col("o_totalprice").alias("v")
    )
    ref = o.where(F.col("y") == PSI_REF_YEAR)
    cur = o.where(F.col("y") == PSI_CUR_YEAR)
    edges = ref.agg(
        F.min("v").alias("lo"),
        ((F.max("v") - F.min("v")) / PSI_BINS).alias("w"),
        F.count(F.lit(1)).cast("double").alias("n_ref_total"),
    )
    cur_total = cur.agg(F.count(F.lit(1)).cast("double").alias("n_cur_total"))

    def hist(side: DataFrame, alias: str) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(edges.select("lo", "w")))
            .select(
                F.least(
                    F.greatest(
                        F.floor((F.col("v") - F.col("lo")) / F.col("w")).cast("bigint"),
                        F.lit(0),
                    ),
                    F.lit(PSI_BINS - 1),
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    spine = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    p = (
        spine.join(hist(ref, "n_ref"), "bin", "left")
        .join(hist(cur, "n_cur"), "bin", "left")
        .crossJoin(F.broadcast(edges.select("n_ref_total")))
        .crossJoin(F.broadcast(cur_total))
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            (
                F.coalesce("n_ref", F.lit(0)) / F.col("n_ref_total") + PSI_EPS
            ).alias("p_ref_raw"),
            (
                F.coalesce("n_cur", F.lit(0)) / F.col("n_cur_total") + PSI_EPS
            ).alias("p_cur_raw"),
        )
    )
    return p.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round("p_ref_raw", 6).alias("p_ref"),
        F.round("p_cur_raw", 6).alias("p_cur"),
        F.round(
            (F.col("p_cur_raw") - F.col("p_ref_raw"))
            * F.log(F.col("p_cur_raw") / F.col("p_ref_raw")),
            6,
        ).alias("psi_term"),
    )


# ------------------------------------------------- agg_decay_recency

DECAY_QUARTER_MONTHS = 3  # halving period: weight = 2^-(age_months div 3)
DECAY_MAX_SHIFT = 30      # cap the exponent (older → weight 2^-30)


@REG.op(
    "agg_decay_recency",
    oracle=f"""
    WITH tgt AS (
      SELECT max(date_trunc('month', o_orderdate)) AS ref_month FROM orders
    ),
    aged AS (
      SELECT o_orderpriority AS priority,
             least(datediff('month', date_trunc('month', o_orderdate), ref_month)
                   // {DECAY_QUARTER_MONTHS}, {DECAY_MAX_SHIFT}) AS k
      FROM orders, tgt
    )
    SELECT priority, count(*) AS n_orders,
           sum(1.0 / CAST(1::BIGINT << k AS DOUBLE)) AS decayed_weight
    FROM aged GROUP BY 1
    """,
)
def agg_decay_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed volume per priority — the freshness-weighted
    popularity signal (trending detection, recency-weighted source
    sampling for corpus mixes): each order contributes 2^-(age/3mo),
    halving every quarter relative to the newest month in the table.

    The float trap this op is built to dodge: exp()/pow() differ in
    the last ulp across engines and a 150k-term sum amplifies the
    drift past any fixed rounding. Here every weight is an EXACT
    dyadic (1 / 2^k via integer shift, k capped at {DECAY_MAX_SHIFT})
    and every partial sum stays exact (count mantissa bits + max
    shift < 53), so the aggregate is bit-identical under ANY addition
    order — hash-stable across engines and across Spark partitionings
    by construction, no rounding needed. One map-side-combinable
    aggregate; the as-of month is an aggregate scalar broadcast back,
    never a driver literal."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.trunc("o_orderdate", "month").alias("month"),
    )
    ref = o.agg(F.max("month").alias("ref_month"))
    aged = o.crossJoin(F.broadcast(ref)).select(
        "priority",
        F.least(
            F.expr(
                f"CAST(months_between(ref_month, month) AS INT) div {DECAY_QUARTER_MONTHS}"
            ),
            F.lit(DECAY_MAX_SHIFT),
        ).alias("k"),
    )
    return aged.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.lit(1.0) / F.expr("shiftleft(1L, k)").cast("double")).alias(
            "decayed_weight"
        ),
    )


# ----------------------------------------------------- agg_percentiles

@REG.op(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*) AS n,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders GROUP BY 1
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group (the reference's
    describe()-style quantile summaries, reports/eda.md) via Spark's
    `percentile` aggregate — not approx_percentile, so the value
    hash-matches quantile_cont in any engine that implements the
    ANSI percentile_cont interpolation (x[lo] + frac*(x[lo+1]-x[lo])
    over the sorted group).

    Scale: exact percentiles need the group's values together — one
    shuffle on the group key, sort within group. Fine when groups are
    few and fit an executor (5 priorities here); for billions of rows
    per group the scale path is agg_sketch_quantiles (KLL-style
    mergeable sketch, already registered) — this op is the exactness
    anchor the sketch op's error is judged against.
    Both engines interpolate over float64 in sorted order, so the
    arithmetic is order-identical; round(4) guards the last ulp."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
        )
    )


# ------------------------------------------------------------ agg_gini

@REG.op(
    "agg_gini",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, c.c_custkey,
               sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS x
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT segment, x,
               row_number() OVER (PARTITION BY segment ORDER BY x, c_custkey) AS i,
               count(*)     OVER (PARTITION BY segment) AS n
        FROM spend
    )
    SELECT segment, max(n) AS n_customers,
           round(CAST(sum(CAST(i AS DECIMAL(18,0)) * x) AS DOUBLE) * 2.0
                 / (max(n) * CAST(sum(x) AS DOUBLE))
                 - (max(n) + 1.0) / max(n), 4) AS gini
    FROM ranked GROUP BY segment
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient per market segment —
    the inequality KPI behind the reference's top-N concentration
    panels (reports/concentration.md): G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n
    over per-customer spend sorted ascending.

    Float discipline: spend is an exact DECIMAL sum, the rank-weighted
    sum Σ(i·x_i) stays in DECIMAL (exact under any partial-sum order);
    only the final ratio drops to float64, then round(4). Ties in x are
    broken by custkey so both engines rank identically.

    Scale: two key-shuffles (custkey aggregate, segment window). The
    window sorts within segment — for a segment too big for one
    executor the two aggregates Σ(i·x) and Σx decompose into
    distributed prefix sums, but at dashboard cardinality the plain
    window is the right plan."""
    spend = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    w = W.partitionBy("segment")
    ranked = spend.select(
        "segment",
        "x",
        F.row_number().over(w.orderBy("x", "c_custkey")).alias("i"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return ranked.groupBy("segment").agg(
        F.max("n").alias("n_customers"),
        F.round(
            F.sum(F.col("i").cast("decimal(18,0)") * F.col("x")).cast("double")
            * 2.0
            / (F.max("n") * F.sum("x").cast("double"))
            - (F.max("n") + 1.0) / F.max("n"),
            4,
        ).alias("gini"),
    )


# ------------------------------------------------------------ cust_rfm

@REG.op(
    "cust_rfm",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               date_diff('day', max(o_orderdate),
                         (SELECT max(o_orderdate) FROM orders)) AS recency_days,
               count(*) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        FROM orders GROUP BY 1
    )
    SELECT custkey, recency_days, frequency,
           round(CAST(monetary AS DOUBLE), 2) AS monetary,
           ntile(4) OVER (ORDER BY recency_days DESC, custkey) AS r_score,
           ntile(4) OVER (ORDER BY frequency, custkey)         AS f_score,
           ntile(4) OVER (ORDER BY monetary, custkey)          AS m_score
    FROM base
    """,
)
def cust_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation (recency / frequency / monetary) —
    the customer-value scoring the reference's sales dashboards bin
    accounts by (reports/segments.md). Score 4 = best quartile on
    every axis (most recent, most frequent, highest spend), so each
    NTILE orders worst-first.

    Determinism: NTILE boundaries depend on the total order, so every
    ORDER BY carries custkey as the tiebreak — both engines implement
    ANSI ntile (first n mod k buckets get the extra row), which makes
    the bucket assignment identical. Monetary is an exact DECIMAL sum
    before the ranking.

    Scale: one shuffle on custkey, then three global-sort windows.
    Unpartitioned NTILE serializes through one task — at 100 TB you'd
    swap each for a 2-stage rank (range-partitioned sort + offset
    merge) or percent_rank-based binning; at customer-dimension
    cardinality (millions) the single-task sort is still seconds."""
    o = load(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("asof"))
    base = (
        o.crossJoin(F.broadcast(ref))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.max("asof"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon_d"),
        )
    )
    return base.select(
        "custkey",
        "recency_days",
        "frequency",
        F.round(F.col("mon_d").cast("double"), 2).alias("monetary"),
        F.ntile(4)
        .over(W.orderBy(F.desc("recency_days"), "custkey"))
        .alias("r_score"),
        F.ntile(4).over(W.orderBy("frequency", "custkey")).alias("f_score"),
        F.ntile(4).over(W.orderBy("mon_d", "custkey")).alias("m_score"),
    )


# ----------------------------------------------------- agg_basket_pairs

BASKET_MIN_PAIR_COUNT = 3


@REG.op(
    "agg_basket_pairs",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pair AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_together
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {BASKET_MIN_PAIR_COUNT}
    ), freq AS (
        SELECT l_partkey, count(*) AS n_part FROM items GROUP BY 1
    ), total AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items)
    SELECT p.part_a, p.part_b, p.n_together,
           round(CAST(p.n_together AS DOUBLE) * t.n_orders
                 / (fa.n_part * fb.n_part), 4) AS lift
    FROM pair p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN total t
    """,
)
def agg_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts co-occurring in the same order
    with support count and lift — the co-purchase affinity behind the
    reference's related-parts panel. Lift = P(a,b) / (P(a)·P(b)) =
    n_together·n_orders / (n_a·n_b); integer-valued inputs so the only
    float op is one division, round(4).

    Scale: the self-join co-locates on orderkey (one shuffle each
    side), and the pair blow-up is Σ k_i² over basket sizes — bounded
    because baskets are small (TPC-H ≤ 7 lines), NOT by table size;
    a 100 TB run adds a basket-size cap before pairing to keep one
    mega-basket from emitting millions of pairs. The HAVING prunes the
    long tail before the two (broadcast-sized) frequency joins."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    pair = (
        a.join(b, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_together"))
        .filter(F.col("n_together") >= BASKET_MIN_PAIR_COUNT)
    )
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    total = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    return (
        pair.join(
            F.broadcast(freq.select(F.col("l_partkey").alias("part_a"),
                                    F.col("n_part").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(freq.select(F.col("l_partkey").alias("part_b"),
                                    F.col("n_part").alias("n_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "n_together",
            F.round(
                F.col("n_together").cast("double") * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


# ------------------------------------------------------------ agg_benford

@REG.op(
    "agg_benford",
    oracle="""
    WITH d AS (
        SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]')
                    AS INT) AS digit
        FROM orders WHERE o_totalprice > 0
    ), c AS (
        SELECT digit, count(*) AS n FROM d GROUP BY 1
    ), t AS (SELECT sum(n) AS total FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / total, 4) AS obs_freq,
           round(log10(1.0 + 1.0 / digit), 4) AS exp_freq,
           round(n * 1.0 / total - log10(1.0 + 1.0 / digit), 4) AS excess
    FROM c CROSS JOIN t
    """,
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the money column — the
    classic fabricated-data / fraud screen: natural multi-scale
    amounts follow P(d) = log10(1 + 1/d), and a ledger whose digit
    histogram deviates hard was rounded, capped, or invented.

    The first SIGNIFICANT digit comes from the string rendering's
    first [1-9] (works identically for plain and scientific notation,
    and for values < 1) — no log/floor arithmetic whose boundary ulps
    (log10(1000) = 2.999…) could put a row in the wrong bucket in one
    engine only. One 9-bucket aggregate with map-side combine; the
    total is an aggregate scalar cross-joined back."""
    d = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 0)
        .select(
            F.regexp_extract(F.col("o_totalprice").cast("string"), "[1-9]", 0)
            .cast("int")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("total"), 4).alias("obs_freq"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias("exp_freq"),
        F.round(
            F.col("n") / F.col("total") - F.log10(1.0 + 1.0 / F.col("digit")), 4
        ).alias("excess"),
    )


# ------------------------------------------------------------ agg_pareto

PARETO_SHARE = 80  # integer percent: revenue share the head must reach


@REG.op(
    "agg_pareto",
    oracle=f"""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, c.c_custkey,
               sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS x
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT segment, x,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY x DESC, c_custkey) AS rk,
               sum(x) OVER (PARTITION BY segment
                            ORDER BY x DESC, c_custkey) AS cum,
               sum(x) OVER (PARTITION BY segment) AS total,
               count(*) OVER (PARTITION BY segment) AS n
        FROM spend
    )
    SELECT segment, max(n) AS n_customers,
           round(CAST(max(CASE WHEN rk * 10 <= n THEN cum END) AS DOUBLE)
                 / CAST(max(total) AS DOUBLE), 4) AS share_top10pct,
           CAST(min(CASE WHEN cum * 100 >= total * {PARETO_SHARE}
                         THEN rk END) AS BIGINT) AS n_for_{PARETO_SHARE}pct
    FROM ranked GROUP BY 1
    """,
)
def agg_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per segment: the revenue share held by the
    top-10% customers, and how few customers carry {PARETO_SHARE}% of
    revenue — the 80/20 dashboard next to agg_gini's single-number
    summary. Exactness: spend and every running sum stay DECIMAL; the
    two threshold comparisons are INTEGER cross-products
    (rk·10 ≤ n, cum·100 ≥ total·{PARETO_SHARE}) so no 0.8-in-float
    boundary exists anywhere; only the final share ratio is float,
    round(4).

    Scale: one custkey shuffle, one segment window (millions of rows
    per segment sort fine; the running sum rides the same sort), one
    tiny aggregate."""
    spend = (
        load(spark, sf_dir, "customer")
        .join(load(spark, sf_dir, "orders"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    w = W.partitionBy("segment").orderBy(F.desc("x"), "c_custkey")
    ranked = spend.select(
        "segment",
        "x",
        F.row_number().over(w).alias("rk"),
        F.sum("x").over(w).alias("cum"),
        F.sum("x").over(W.partitionBy("segment")).alias("total"),
        F.count(F.lit(1)).over(W.partitionBy("segment")).alias("n"),
    )
    return ranked.groupBy("segment").agg(
        F.max("n").alias("n_customers"),
        F.round(
            F.max(F.when(F.col("rk") * 10 <= F.col("n"), F.col("cum"))).cast(
                "double"
            )
            / F.max("total").cast("double"),
            4,
        ).alias("share_top10pct"),
        F.min(
            F.when(
                F.col("cum") * 100 >= F.col("total") * PARETO_SHARE, F.col("rk")
            )
        ).alias(f"n_for_{PARETO_SHARE}pct"),
    )


# ------------------------------------------------------------ dq_freshness

FRESH_STALE_HOURS = 24  # a feed lagging the newest data by more is stale


@REG.op(
    "dq_freshness",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               CAST(floor(epoch(max(ts))) AS BIGINT) AS last_ts_s,
               count(*) AS n_events
        FROM events GROUP BY 1
    ), ref AS (SELECT max(last_ts_s) AS asof_s FROM m)
    SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
           asof_s - last_ts_s AS lag_s,
           (asof_s - last_ts_s) > {FRESH_STALE_HOURS} * 3600 AS is_stale
    FROM m CROSS JOIN ref
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness check — the fourth dq class beside
    dq_expectations (row rules), dq_referential (FK orphans), and
    dq_psi_drift (distribution shift): each event type's newest
    timestamp vs the dataset's as-of point; a feed lagging by more
    than {FRESH_STALE_HOURS}h is flagged. The as-of is an aggregate
    scalar broadcast back — never a wall-clock call, so the check is
    deterministic and replayable (and the same shape a production run
    gets by swapping the as-of for now()).

    Scale: one map-side-combinable max/count aggregate over the fact
    table, one broadcast — the cheapest dq op in the family."""
    m = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.max(F.col("ts").cast("timestamp").cast("long")).alias("last_ts_s"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    asof = m.agg(F.max("last_ts_s").alias("asof_s"))
    return m.crossJoin(F.broadcast(asof)).select(
        "event_type",
        "n_events",
        (F.col("asof_s") - F.col("last_ts_s")).alias("lag_s"),
        (
            (F.col("asof_s") - F.col("last_ts_s")) > FRESH_STALE_HOURS * 3600
        ).alias("is_stale"),
    )


# --------------------------------------------------------- agg_cohort_ltv

@REG.op(
    "agg_cohort_ltv",
    oracle="""
    WITH f AS (
        SELECT o_custkey,
               min(year(o_orderdate) * 12 + month(o_orderdate)) AS m0
        FROM orders GROUP BY 1
    ), contrib AS (
        SELECT f.m0,
               (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.m0 AS age_m,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev,
               o.o_custkey
        FROM orders o JOIN f ON f.o_custkey = o.o_custkey
    ), cohort AS (
        SELECT m0, count(DISTINCT o_custkey) AS n_customers FROM contrib GROUP BY 1
    ), by_age AS (
        SELECT m0, age_m, sum(rev) AS rev_m FROM contrib GROUP BY 1, 2
    ), cum AS (
        SELECT m0, age_m,
               sum(rev_m) OVER (PARTITION BY m0 ORDER BY age_m) AS cum_rev
        FROM by_age
    )
    SELECT concat(CAST((cum.m0 - 1) // 12 AS VARCHAR), '-',
                  lpad(CAST((cum.m0 - 1) % 12 + 1 AS VARCHAR), 2, '0'))
             AS cohort_month,
           cum.age_m,
           c.n_customers,
           round(CAST(cum.cum_rev AS DOUBLE), 2) AS cum_revenue,
           CAST(CAST(cum.cum_rev * 100 AS HUGEINT) // c.n_customers AS BIGINT)
             AS ltv_cents_per_cust
    FROM cum JOIN cohort c ON c.m0 = cum.m0
    """,
)
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, cumulative revenue per cohort by months-since-acquisition,
    normalized per cohort head — the revenue twin of evt_retention's
    activity matrix (the two panels every growth dashboard pairs).

    Months are INTEGER month-serials (y·12+m) so cohort age is exact
    arithmetic — no months_between float, no calendar truncation
    drift; the serial converts back to 'YYYY-MM' for display. Revenue
    stays DECIMAL through the running sum; the per-customer LTV is
    integer CENTS via floor division (see inline note — the ratio in
    float landed on exact .xxx5 rounding ties).

    Scale: one custkey shuffle (first-order), one join back, one
    (cohort, age) aggregate, and the running sum over the TINY
    cohort×age grid — the raw fact table never enters a window."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ms"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    f = o.groupBy("o_custkey").agg(F.min("ms").alias("m0"))
    contrib = o.join(f, "o_custkey").select(
        "m0", (F.col("ms") - F.col("m0")).alias("age_m"), "rev", "o_custkey"
    )
    cohort = contrib.groupBy("m0").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )
    by_age = contrib.groupBy("m0", "age_m").agg(F.sum("rev").alias("rev_m"))
    cum = by_age.select(
        "m0",
        "age_m",
        F.sum("rev_m")
        .over(W.partitionBy("m0").orderBy("age_m"))
        .alias("cum_rev"),
    )
    return cum.join(F.broadcast(cohort), "m0").select(
        F.concat(
            ((F.col("m0") - 1) / 12).cast("int").cast("string"),
            F.lit("-"),
            F.lpad(((F.col("m0") - 1) % 12 + 1).cast("string"), 2, "0"),
        ).alias("cohort_month"),
        "age_m",
        "n_customers",
        F.round(F.col("cum_rev").cast("double"), 2).alias("cum_revenue"),
        # LTV as integer CENTS per customer (floor division): revenue
        # cents / small cohort sizes land on exact .xxx5 ties where the
        # engines' float round() disagree by one ulp — integer floor
        # division has no tie to break (the dyadic-weights lesson)
        F.expr("CAST(cum_rev * 100 AS BIGINT) div n_customers").alias(
            "ltv_cents_per_cust"
        ),
    )


# --------------------------------------------------------- agg_abc_class

ABC_A_PCT = 80  # cumulative-revenue boundaries, integer percents
ABC_B_PCT = 95


@REG.op(
    "agg_abc_class",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
        FROM lineitem GROUP BY 1
    ), ranked AS (
        SELECT l_partkey, r,
               sum(r) OVER (ORDER BY r DESC, l_partkey) AS cum,
               sum(r) OVER () AS total,
               row_number() OVER (ORDER BY r DESC, l_partkey) AS rk
        FROM rev
    )
    SELECT l_partkey, round(CAST(r AS DOUBLE), 2) AS revenue, rk,
           round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 4) AS cum_share,
           CASE WHEN cum * 100 <= total * {ABC_A_PCT} THEN 'A'
                WHEN cum * 100 <= total * {ABC_B_PCT} THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def agg_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: every part ranked by revenue,
    class A while the running share stays ≤ {ABC_A_PCT}%, B to
    {ABC_B_PCT}%, C beyond — agg_pareto's summary turned into the
    per-item label a stocking policy consumes. Boundaries compare
    DECIMAL cross-products (cum·100 vs total·pct), so class flips
    can't ride a float ulp; revenue ties break by partkey.

    Scale: the unpartitioned ranking window serializes the PART
    dimension (not the fact table) through one task — fine at
    catalog cardinality; beyond that the 2-stage range-partitioned
    rank (sort_global_shards' pattern) replaces it."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r"))
    )
    w = W.orderBy(F.desc("r"), "l_partkey")
    ranked = rev.select(
        "l_partkey",
        "r",
        F.sum("r").over(w).alias("cum"),
        F.sum("r").over(W.partitionBy()).alias("total"),
        F.row_number().over(w).alias("rk"),
    )
    return ranked.select(
        "l_partkey",
        F.round(F.col("r").cast("double"), 2).alias("revenue"),
        "rk",
        F.round(F.col("cum").cast("double") / F.col("total").cast("double"), 4)
        .alias("cum_share"),
        F.when(F.col("cum") * 100 <= F.col("total") * ABC_A_PCT, "A")
        .when(F.col("cum") * 100 <= F.col("total") * ABC_B_PCT, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# ------------------------------------------------------- agg_survival_km

KM_CENSOR_DAYS = 90  # customers last seen within this of the dataset
#                      edge are censored (their churn is unobserved)


@REG.op(
    "agg_survival_km",
    oracle=f"""
    WITH span AS (
        SELECT o_custkey,
               date_diff('day', min(o_orderdate), max(o_orderdate)) AS t,
               date_diff('day', max(o_orderdate),
                         (SELECT max(o_orderdate) FROM orders))
                 < {KM_CENSOR_DAYS} AS censored
        FROM orders GROUP BY 1
    ), ev AS (
        SELECT t, count(*) FILTER (NOT censored) AS d,
               count(*) AS exits
        FROM span GROUP BY t
    ), risk AS (
        SELECT t, d,
               (SELECT count(*) FROM span)
                 - coalesce(sum(exits) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_at_risk
        FROM ev
    )
    SELECT t AS lifetime_days, CAST(d AS BIGINT) AS n_churned,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           round(exp(sum(ln(1.0 - d * 1.0 / n_at_risk))
                     OVER (ORDER BY t)), 4) AS survival
    FROM risk WHERE d > 0
    """,
)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer lifetime (days between
    first and last order), with right-censoring: customers still
    active near the dataset edge (< {KM_CENSOR_DAYS} days before the
    as-of) haven't churned — treating them as deaths is the classic
    bias KM exists to avoid. S(t) = Π(1 − d_i/n_i) over event times;
    the product is exp(Σ ln(·)) so the running aggregate is
    distributable, and both engines fold the SAME doubles in the SAME
    (t-ordered) sequence — identical bit results, round(4) on top.

    Scale: one custkey aggregate; event times collapse to a tiny
    per-day grid before any window; the as-of is an aggregate scalar
    (subquery / broadcast), never wall-clock."""
    o = load(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("asof"))
    span = (
        o.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("t"),
            (
                F.datediff(F.max("asof"), F.max("o_orderdate")) < KM_CENSOR_DAYS
            ).alias("censored"),
        )
    )
    total = span.agg(F.count(F.lit(1)).alias("n_total"))
    ev = span.groupBy("t").agg(
        F.count(F.when(~F.col("censored"), 1)).alias("d"),
        F.count(F.lit(1)).alias("exits"),
    )
    wt = W.orderBy("t")
    risk = (
        ev.crossJoin(F.broadcast(total))
        .select(
            "t",
            "d",
            (
                F.col("n_total")
                - F.coalesce(
                    F.sum("exits").over(
                        wt.rowsBetween(W.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            ).alias("n_at_risk"),
        )
    )
    return (
        risk.select(
            F.col("t").alias("lifetime_days"),
            F.col("d").alias("n_churned"),
            "n_at_risk",
            F.round(
                F.exp(
                    F.sum(F.log(1.0 - F.col("d") / F.col("n_at_risk"))).over(
                        W.orderBy("t")
                    )
                ),
                4,
            ).alias("survival"),
        )
        .where(F.col("n_churned") > 0)
    )


# -------------------------------------------------------- dq_column_profile

PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


@REG.op(
    "dq_column_profile",
    oracle="""
    WITH vals AS (
        SELECT 'o_orderstatus' AS col, CAST(o_orderstatus AS VARCHAR) AS v FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
    ), c AS (
        SELECT col, v, count(*) AS n FROM vals GROUP BY 1, 2
    ), tot AS (
        SELECT col, CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_distinct
        FROM c GROUP BY col
    ), t AS (
        SELECT c.col, max(tot.n_rows) AS n_rows, max(tot.n_distinct) AS n_distinct,
               round(sum(-(c.n * 1.0 / tot.n_rows)
                         * ln(c.n * 1.0 / tot.n_rows)), 4) AS entropy
        FROM c JOIN tot ON tot.col = c.col GROUP BY c.col
    ), top AS (
        SELECT col, v AS top_value, CAST(n AS BIGINT) AS top_n,
               row_number() OVER (PARTITION BY col ORDER BY n DESC, v) AS rk
        FROM c
    )
    SELECT t.col, t.n_rows, CAST(t.n_distinct AS BIGINT) AS n_distinct,
           round(t.n_distinct * 1.0 / t.n_rows, 4) AS distinct_ratio,
           t.entropy, top.top_value, top.top_n
    FROM t JOIN top ON top.col = t.col AND top.rk = 1
    """,
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in ONE scan — the pandas-profiling summary
    (row count, cardinality, distinct ratio, Shannon entropy, modal
    value) for a declared column set, as the fifth dq class: entropy
    near zero flags a degenerate feed (one value took over), a
    distinct-ratio jump flags a key column leaking into a categorical.

    One scan: each row EXPLODES to (col, value-as-string) pairs — 4×
    row expansion instead of 4 table scans — then a single (col, v)
    aggregate feeds every statistic. Modal ties break lexicographically
    so both engines elect the same value; entropy is a float sum over
    value frequencies (fold-order drift ~1e-12, round(4)).

    At 100 TB the same plan holds: the explode is map-side, the value
    histogram is the only shuffle, and adding columns is O(columns)
    expansion of the SAME pass — never new scans."""
    o = load(spark, sf_dir, "orders")
    pairs = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in PROFILE_COLS
                ]
            )
        ).alias("p")
    ).select("p.col", "p.v")
    c = pairs.groupBy("col", "v").agg(F.count(F.lit(1)).alias("n"))
    wcol = W.partitionBy("col")
    withp = c.withColumn("p", F.col("n") / F.sum("n").over(wcol))
    t = withp.groupBy("col").agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.sum(-F.col("p") * F.log("p")), 4).alias("entropy"),
    )
    top = (
        c.withColumn(
            "rk",
            F.row_number().over(wcol.orderBy(F.desc("n"), "v")),
        )
        .where(F.col("rk") == 1)
        .select("col", F.col("v").alias("top_value"), F.col("n").alias("top_n"))
    )
    return (
        t.join(F.broadcast(top), "col")
        .select(
            "col",
            "n_rows",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_rows"), 4).alias(
                "distinct_ratio"
            ),
            "entropy",
            "top_value",
            "top_n",
        )
    )


# ---------------------------------------------------- agg_new_vs_returning

@REG.op(
    "agg_new_vs_returning",
    oracle="""
    WITH o AS (
        SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS ms,
               CAST(o_totalprice AS DECIMAL(18,2)) AS rev
        FROM orders
    ), f AS (
        SELECT o_custkey, min(ms) AS m0 FROM o GROUP BY 1
    ), tagged AS (
        SELECT o.ms, o.rev, o.ms = f.m0 AS is_new
        FROM o JOIN f ON f.o_custkey = o.o_custkey
    ), m AS (
        SELECT ms,
               count(*) FILTER (is_new) AS new_orders,
               count(*) FILTER (NOT is_new) AS ret_orders,
               CAST(coalesce(sum(rev) FILTER (is_new), 0) * 100 AS BIGINT)
                 AS new_cents,
               CAST(coalesce(sum(rev) FILTER (NOT is_new), 0) * 100 AS BIGINT)
                 AS ret_cents
        FROM tagged GROUP BY 1
    )
    SELECT concat(CAST((ms - 1) // 12 AS VARCHAR), '-',
                  lpad(CAST((ms - 1) % 12 + 1 AS VARCHAR), 2, '0')) AS month,
           CAST(new_orders AS BIGINT) AS new_orders,
           CAST(ret_orders AS BIGINT) AS ret_orders,
           new_cents, ret_cents,
           CAST(new_cents * 10000 // greatest(new_cents + ret_cents, 1)
                AS BIGINT) AS new_share_bp
    FROM m
    """,
)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning revenue mix per month — the acquisition-vs-
    retention balance every growth report opens with: an order is
    "new" iff it falls in its customer's first month. Integer month
    serials for the first-month test, money in cents, share in basis
    points by floor division — the all-integer hash discipline
    (ep9_growth_e2e's construction).

    Scale: one custkey shuffle for first months, a join back, one
    month-grain aggregate with FILTER-style conditional sums (one
    pass, map-side combinable)."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ms"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    f = o.groupBy("o_custkey").agg(F.min("ms").alias("m0"))
    tagged = o.join(f, "o_custkey").select(
        "ms", "rev", (F.col("ms") == F.col("m0")).alias("is_new")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    m = tagged.groupBy("ms").agg(
        F.count(F.when(F.col("is_new"), 1)).alias("new_orders"),
        F.count(F.when(~F.col("is_new"), 1)).alias("ret_orders"),
        (
            F.coalesce(F.sum(F.when(F.col("is_new"), F.col("rev"))), zero) * 100
        )
        .cast("long")
        .alias("new_cents"),
        (
            F.coalesce(F.sum(F.when(~F.col("is_new"), F.col("rev"))), zero)
            * 100
        )
        .cast("long")
        .alias("ret_cents"),
    )
    return m.select(
        F.concat(
            ((F.col("ms") - 1) / 12).cast("int").cast("string"),
            F.lit("-"),
            F.lpad(((F.col("ms") - 1) % 12 + 1).cast("string"), 2, "0"),
        ).alias("month"),
        "new_orders",
        "ret_orders",
        "new_cents",
        "ret_cents",
        F.expr(
            "CAST(new_cents * 10000 AS BIGINT) div greatest(new_cents + ret_cents, 1L)"
        ).alias("new_share_bp"),
    )


# --------------------------------------------------------- agg_return_rates

@REG.op(
    "agg_return_rates",
    oracle="""
    WITH j AS (
        SELECT p.p_type, l.l_returnflag = 'R' AS is_ret
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), per AS (
        SELECT p_type, count(*) AS n_lines,
               count(*) FILTER (is_ret) AS n_returned
        FROM j GROUP BY 1
    ), g AS (
        SELECT CAST(sum(n_returned) AS BIGINT) AS gr,
               CAST(sum(n_lines) AS BIGINT) AS gn
        FROM per
    )
    SELECT per.p_type, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_returned AS BIGINT) AS n_returned,
           CAST(n_returned * 10000 // n_lines AS BIGINT) AS return_bp,
           round((n_returned * 1.0 / n_lines) / (g.gr * 1.0 / g.gn), 4)
             AS lift_vs_global
    FROM per CROSS JOIN g
    """,
)
def agg_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate analysis per part type — the quality-complaint
    breakdown by product family the reference's plant dashboards
    present for claims: rate in basis points (integer floor division,
    no float boundary) plus lift against the global rate (which part
    families get returned MORE than the portfolio average). The part
    dimension joins broadcast; the global rate is an aggregate scalar
    cross-joined back. One fact scan, one (tiny) type-grain shuffle."""
    j = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", (F.col("l_returnflag") == "R").alias("is_ret"))
        .join(
            F.broadcast(
                load(spark, sf_dir, "part").select("p_partkey", "p_type")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    per = j.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(F.col("is_ret"), 1)).alias("n_returned"),
    )
    g = per.agg(
        F.sum("n_returned").alias("gr"), F.sum("n_lines").alias("gn")
    )
    return per.crossJoin(F.broadcast(g)).select(
        "p_type",
        "n_lines",
        "n_returned",
        F.expr("CAST(n_returned * 10000 AS BIGINT) div n_lines").alias(
            "return_bp"
        ),
        F.round(
            (F.col("n_returned") / F.col("n_lines"))
            / (F.col("gr") / F.col("gn")),
            4,
        ).alias("lift_vs_global"),
    )


# -------------------------------------------------------- agg_supply_risk

@REG.op(
    "agg_supply_risk",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), per AS (
        SELECT l_partkey, count(*) AS n_suppliers FROM ps GROUP BY 1
    ), j AS (
        SELECT p.p_brand, per.n_suppliers
        FROM per JOIN part p ON p.p_partkey = per.l_partkey
    )
    SELECT p_brand, count(*) AS n_parts,
           count(*) FILTER (n_suppliers = 1) AS n_single_sourced,
           CAST(count(*) FILTER (n_suppliers = 1) * 10000 // count(*)
                AS BIGINT) AS single_bp,
           CAST(max(n_suppliers) AS BIGINT) AS max_suppliers
    FROM j GROUP BY 1
    """,
)
def agg_supply_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration risk per brand: how many parts are
    SINGLE-SOURCED (one supplier ever shipped them) — the multi-
    sourcing dq view a procurement dashboard keys on (a single-sourced
    part is a line-down risk; a brand where most parts are is a
    structural one). Distinct (part, supplier) pairs collapse the fact
    table first — one shuffle on partkey — then the part dim joins
    broadcast and the brand rollup is tiny. Shares in basis points
    (integer floor division)."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    per = ps.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    j = per.join(
        F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.count(F.when(F.col("n_suppliers") == 1, 1)).alias("n_single_sourced"),
        F.expr(
            "CAST(count(CASE WHEN n_suppliers = 1 THEN 1 END) * 10000 AS BIGINT)"
            " div count(1)"
        ).alias("single_bp"),
        F.max("n_suppliers").cast("long").alias("max_suppliers"),
    )


# ------------------------------------------------- agg_cumulative_distinct

@REG.op(
    "agg_cumulative_distinct",
    oracle="""
    WITH f AS (
        SELECT o_custkey,
               min(year(o_orderdate) * 12 + month(o_orderdate)) AS m0
        FROM orders GROUP BY 1
    ), per AS (
        SELECT m0, count(*) AS n_new FROM f GROUP BY 1
    )
    SELECT concat(CAST((m0 - 1) // 12 AS VARCHAR), '-',
                  lpad(CAST((m0 - 1) % 12 + 1 AS VARCHAR), 2, '0')) AS month,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(sum(n_new) OVER (ORDER BY m0) AS BIGINT) AS cum_customers
    FROM per
    """,
)
def agg_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-acquisition curve: cumulative DISTINCT customers ever
    seen, by month. Cumulative distinct is not a window aggregate any
    engine incrementalizes — the exact decomposition is the
    FIRST-OCCURRENCE trick: each key contributes once at its min
    month, so a per-month first-timer count plus a running sum over
    the tiny month grid reproduces |∪ keys through m| exactly. The
    same rewrite is how a 100 TB deployment gets exact cumulative
    reach without re-scanning history every month (evt_power_users_
    rolling is the windowed sibling; this is the unbounded one).

    One custkey shuffle; the window runs over |months| rows."""
    f = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m0")
        )
    )
    per = f.groupBy("m0").agg(F.count(F.lit(1)).alias("n_new"))
    return per.select(
        F.concat(
            ((F.col("m0") - 1) / 12).cast("int").cast("string"),
            F.lit("-"),
            F.lpad(((F.col("m0") - 1) % 12 + 1).cast("string"), 2, "0"),
        ).alias("month"),
        "n_new",
        F.sum("n_new").over(W.orderBy("m0")).alias("cum_customers"),
    )


# ------------------------------------------------------ agg_seasonal_index

@REG.op(
    "agg_seasonal_index",
    oracle="""
    WITH m AS (
        SELECT o_orderstatus AS status, month(o_orderdate) AS moy, count(*) AS n
        FROM orders GROUP BY 1, 2
    ), avgm AS (
        SELECT status, sum(n) AS total, count(*) AS n_months FROM m GROUP BY 1
    )
    SELECT m.status, CAST(m.moy AS INT) AS moy, CAST(m.n AS BIGINT) AS n,
           CAST(CAST(m.n AS BIGINT) * 10000 * a.n_months // a.total AS BIGINT)
             AS seasonal_index_bp
    FROM m JOIN avgm a ON a.status = m.status
    """,
)
def agg_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal index per calendar month: each month-of-year's
    volume relative to the series' average month, in basis points
    (10000 = an average month) — the ratio-to-moving-average seasonal
    profile the reference's rs_stl_z decomposition assumes, surfaced
    as its own auditable table. n·months/total is computed as ONE
    integer cross-product before the floor division, so the index is
    exact (no float average in the denominator).

    One month-grain aggregate plus a broadcast join back."""
    m = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.month("o_orderdate").alias("moy"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = m.groupBy("status").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_months")
    )
    return m.join(F.broadcast(a), "status").select(
        "status",
        "moy",
        "n",
        F.expr("CAST(n * 10000 * n_months AS BIGINT) div total").alias(
            "seasonal_index_bp"
        ),
    )


# ------------------------------------------------------- agg_backlog_aging

@REG.op(
    "agg_backlog_aging",
    oracle="""
    WITH ref AS (SELECT max(o_orderdate) AS asof FROM orders),
    open_o AS (
        SELECT date_diff('day', o_orderdate, ref.asof) AS age_d,
               CAST(o_totalprice AS DECIMAL(18,2)) AS rev
        FROM orders CROSS JOIN ref
        WHERE o_orderstatus = 'O'
    ), b AS (
        SELECT CASE WHEN age_d = 0 THEN 0 ELSE length(bin(age_d)) END AS bucket,
               rev
        FROM open_o
    )
    SELECT CAST(bucket AS INT) AS bit_bucket,
           count(*) AS n_open,
           CAST(sum(rev) * 100 AS BIGINT) AS open_cents
    FROM b GROUP BY 1
    """,
)
def agg_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: orders still in status 'O' bucketed by
    age in power-of-two days, with the money stuck in each bucket —
    the operations dashboard that separates a healthy rolling backlog
    (mass in young buckets) from rot (old buckets holding value). The
    as-of is the data's own newest date (deterministic, replayable);
    ages bucket by integer BIT LENGTH (the corpus_length_hist trick);
    money stays integer cents.

    One filtered scan + a ~14-cell aggregate; the status filter
    reaches the parquet scan as a pushed predicate."""
    o = load(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("asof"))
    open_o = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(ref))
        .select(
            F.datediff(F.col("asof"), F.col("o_orderdate")).alias("age_d"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
        )
    )
    b = open_o.select(
        F.when(F.col("age_d") == 0, 0)
        .otherwise(F.length(F.bin("age_d")))
        .cast("int")
        .alias("bit_bucket"),
        "rev",
    )
    return b.groupBy("bit_bucket").agg(
        F.count(F.lit(1)).alias("n_open"),
        (F.sum("rev") * 100).cast("long").alias("open_cents"),
    )


# ------------------------------------------------------ agg_rolling_slope

SLOPE_WIN = 6          # rolling OLS window, months
SLOPE_X0 = 1990 * 12   # month-serial origin keeps the moment sums small


@REG.op(
    "agg_rolling_slope",
    oracle=f"""
    WITH m AS (
        SELECT c.c_mktsegment AS segment,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                    - {SLOPE_X0} AS BIGINT) AS x,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) // 100 AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), r AS (
        SELECT segment, x,
               count(*)   OVER w AS n,
               sum(x)     OVER w AS sx,
               sum(y)     OVER w AS sy,
               sum(x * y) OVER w AS sxy,
               sum(x * x) OVER w AS sx2
        FROM m
        WINDOW w AS (PARTITION BY segment ORDER BY x
                     ROWS BETWEEN {SLOPE_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT segment, x AS month_serial,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sx2 - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxy - sx * sy > 0 THEN 'rising'
                WHEN n * sxy - sx * sy < 0 THEN 'falling'
                ELSE 'flat' END AS trend
    FROM r WHERE n = {SLOPE_WIN}
    """,
)
def agg_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {SLOPE_WIN}-month OLS trend slope of revenue per market
    segment — the "is this segment growing?" panel, computed from the
    five MERGEABLE moment sums (n, Σx, Σy, Σxy, Σx²) over one window
    frame: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), emitted as the exact
    integer numerator/denominator pair instead of the float quotient,
    plus the sign classification. Publishing the RATIONAL number is
    what makes an iterative float formula hash-certifiable: every
    moment sum is an integer (whole-dollar y, origin-shifted month
    serial x), exact under any fold order in both engines, and no
    division ever happens.

    x is the actual month serial, not a row index, so a missing month
    widens the regression spacing instead of silently compressing the
    time axis (same sparsity honesty as agg_backtest_snaive's join).

    Scale: one fact shuffle down to the (segment, month) grain, then
    windows over a few-hundred-row frame; the moment-sum shape is the
    same one a streaming/partial aggregation would keep, so the op
    ports to an incremental refresh unchanged."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - SLOPE_X0)
            .cast("long")
            .alias("x"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT) div 100"
            ).alias("y")
        )
    )
    w = (
        W.partitionBy("segment")
        .orderBy("x")
        .rowsBetween(-(SLOPE_WIN - 1), W.currentRow)
    )
    r = m.select(
        "segment",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sx2"),
    ).where(F.col("n") == SLOPE_WIN)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    return r.select(
        "segment",
        F.col("x").alias("month_serial"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(num > 0, "rising")
        .when(num < 0, "falling")
        .otherwise("flat")
        .alias("trend"),
    )


# ------------------------------------------------------ agg_dp_release

DP_EPS = 0.5          # privacy budget; Laplace scale b = 1/eps = 2.0
DP_SALT = "dp-lap-1"  # seed for the deterministic uniform draw


@REG.op(
    "agg_dp_release",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    ),
    drawn AS (
      SELECT event_type, n,
             (CAST(('0x' || substr(md5('{DP_SALT}' || event_type), 1, 8))
                   AS UBIGINT) + 0.5) / 4294967296.0 AS u
      FROM c
    )
    SELECT event_type,
           round(
             greatest(
               n - (1.0 / {DP_EPS}) * sign(u - 0.5)
                   * ln(1.0 - 2.0 * abs(u - 0.5)),
               0.0
             ), 4
           ) AS n_released,
           CAST({DP_EPS} AS DOUBLE) AS epsilon
    FROM drawn
    """,
)
def agg_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release — the privacy family's
    second member beside the k-anonymity gate (agg_kanon_suppress):
    per-group counts (sensitivity 1 under add/remove of one event)
    plus Laplace(1/eps) noise via the inverse CDF, clamped at zero
    for release. The uniform draw derives from a SALTED md5 of the
    group key — the corpus_sample_weighted philosophy: a reproducible,
    auditable draw both engines can recompute exactly, which is what
    makes the release hash-certifiable. This is the TESTABLE TWIN of
    a production release, which swaps ONLY the uniform source for
    secure randomness (same plan, same sensitivity, same clamp); a
    deterministic seed keyed to the data is NOT private in the formal
    sense and the docstring is the documentation of that boundary.

    Scale: one map-side-combinable aggregate to the group grain, then
    per-row noise arithmetic on the group-sized frame — release cost
    is group-count-sized, never data-sized."""
    c = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(DP_SALT), F.col("event_type"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    noise = (
        (F.lit(-1.0 / DP_EPS))
        * F.signum(u - 0.5)
        * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
    )
    return c.select(
        "event_type",
        F.round(F.greatest(F.col("n") + noise, F.lit(0.0)), 4).alias(
            "n_released"
        ),
        F.lit(float(DP_EPS)).alias("epsilon"),
    )
