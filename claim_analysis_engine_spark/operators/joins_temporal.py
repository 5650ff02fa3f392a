"""Temporal join operators Spark has no native syntax for: as-of join
and range (interval/band) join — expressed as compositions of existing
DataFrame ops so Catalyst still owns the physical plan.

The reference engine has no as-of/range joins (SURVEY §2.4: all joins
are equi-joins), but any time-series analytics engine at 100 TB needs
both; they are beyond-reference extensions in SURVEY §2.12.

Scale notes (100 TB):
* join_asof uses the union-and-window formulation: tag both streams,
  union them, and carry the most recent right-side row forward with
  last(..., ignorenulls) over one (key, time)-ordered window. ONE
  shuffle on the join key, zero range explosion — unlike the naive
  `t2.ts <= t1.ts` theta join, whose candidate set is O(n·m) per key.
  This is the same plan a point-in-time-correct feature store runs.
* join_range_bucketed joins a fact column to interval tiers WITHOUT an
  equality key. The naive plan is a broadcast-nested-loop (fine only
  because tiers are tiny); the bucketed formulation — explode each
  tier to the fixed-width buckets it covers, equi-join on the bucket,
  then re-check the exact band predicate — turns the theta join into a
  hash join and keeps working when BOTH sides are large (the classic
  interval-join decomposition used by Flink/Trino range joins).

Timestamps flatten to floored epoch seconds in both engines (the
events.py convention) so sub-second parity issues can't arise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()

ASOF_LEFT_TYPE = "click"  # each click looks up...
ASOF_RIGHT_TYPE = "purchase"  # ...the user's most recent purchase at-or-before it

# price tiers for the range join: [lo, hi) bands over l_extendedprice.
# Deliberately NOT uniform — the bucketed decomposition must handle
# tiers spanning many buckets and buckets spanning no tier boundary.
PRICE_TIERS = [
    ("T1_budget", 0, 5_000),
    ("T2_value", 5_000, 15_000),
    ("T3_mid", 15_000, 30_000),
    ("T4_upper", 30_000, 50_000),
    ("T5_premium", 50_000, 80_000),
    ("T6_luxury", 80_000, 120_000),
]
BUCKET_W = 10_000  # fixed bucket width for the equi-join key


def _events_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        "event_type",
        "value",
    )


# ----------------------------------------------------------- join_asof

@REG.op(
    "join_asof",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             event_type, value
      FROM events
    ),
    pr AS (
      SELECT user_id, ts_s, event_id AS p_event_id, value AS p_value,
             row_number() OVER (PARTITION BY user_id, ts_s
                                ORDER BY event_id DESC) AS rn
      FROM e WHERE event_type = '{ASOF_RIGHT_TYPE}'
    ),
    p1 AS (SELECT user_id, ts_s, p_event_id, p_value FROM pr WHERE rn = 1),
    c AS (SELECT event_id, user_id, ts_s FROM e
          WHERE event_type = '{ASOF_LEFT_TYPE}')
    SELECT c.event_id, c.user_id, c.ts_s,
           p1.p_event_id, p1.ts_s AS p_ts_s,
           c.ts_s - p1.ts_s AS gap_s,
           round(p1.p_value, 4) AS p_value
    FROM c ASOF JOIN p1
      ON c.user_id = p1.user_id AND p1.ts_s <= c.ts_s
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks the same user's most recent
    purchase at-or-before its timestamp (point-in-time-correct lookup,
    the feature-store join). Spark has no ASOF syntax; the scalable
    formulation is union-and-window: tag purchases kind=0 / clicks
    kind=1, union, and within one (user_id)-keyed window ordered by
    (ts_s, kind, event_id) carry purchase attributes forward with
    last(ignorenulls). kind orders purchases before clicks on the same
    second, which makes the lookup inclusive (<=); purchases are first
    deduped to one row per (user, second), keeping the max event_id,
    so both engines resolve ties identically. Inner semantics: clicks
    with no prior purchase drop (also keeps every output column
    non-null — a nullable BIGINT would render as float64 from the
    oracle and break the driver hash).

    One shuffle on user_id, no O(n·m) candidate explosion — this exact
    plan survives 100 TB of events; the DuckDB oracle is a native
    ASOF JOIN, proving the window formulation implements the same
    semantics."""
    e = _events_epoch(spark, sf_dir)
    wp = W.partitionBy("user_id", "ts_s").orderBy(F.col("event_id").desc())
    p1 = (
        e.where(F.col("event_type") == ASOF_RIGHT_TYPE)
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "ts_s",
            F.lit(0).alias("kind"),
            F.col("event_id"),
            F.col("value"),
        )
    )
    c = e.where(F.col("event_type") == ASOF_LEFT_TYPE).select(
        "user_id", "ts_s", F.lit(1).alias("kind"), "event_id", "value"
    )
    u = p1.unionByName(c)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_s", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_p = F.col("kind") == 0
    carried = (
        u.withColumn("p_event_id", F.last(F.when(is_p, F.col("event_id")), True).over(w))
        .withColumn("p_ts_s", F.last(F.when(is_p, F.col("ts_s")), True).over(w))
        .withColumn("p_val", F.last(F.when(is_p, F.col("value")), True).over(w))
    )
    return (
        carried.where((F.col("kind") == 1) & F.col("p_event_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts_s",
            "p_event_id",
            "p_ts_s",
            (F.col("ts_s") - F.col("p_ts_s")).alias("gap_s"),
            F.round("p_val", 4).alias("p_value"),
        )
    )


# -------------------------------------------------- join_range_bucketed

_TIERS_SQL = "(VALUES " + ", ".join(
    f"('{name}', {lo}, {hi})" for name, lo, hi in PRICE_TIERS
) + ") AS tiers(tier, lo, hi)"


@REG.op(
    "join_range_bucketed",
    oracle=f"""
    SELECT tier, lo, hi,
           count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS revenue,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem JOIN {_TIERS_SQL}
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY 1, 2, 3
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join without an equality key: assign each lineitem
    to the price tier whose [lo, hi) interval contains its price, then
    aggregate per tier. The naive theta join is a nested-loop; the
    scalable decomposition is: explode each tier into the fixed-width
    buckets its interval covers (a tiny, bounded expansion), bucket
    each fact row by floor(price / W), hash-join on the bucket id, and
    re-check the exact band predicate. The theta join becomes an
    equi-join — at 100 TB this shuffles on uniform bucket keys and
    works even when the interval side is far too large to broadcast.
    (The oracle states the same semantics as the plain range predicate
    it decomposes.)"""
    tiers = spark.createDataFrame(PRICE_TIERS, "tier string, lo long, hi long")
    # explode each tier to every bucket id its interval touches
    tier_buckets = tiers.select(
        "tier",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                (F.col("lo") / BUCKET_W).cast("long"),
                ((F.col("hi") - 1) / BUCKET_W).cast("long"),
            )
        ).alias("bucket"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_extendedprice",
        "l_quantity",
        (F.col("l_extendedprice") / BUCKET_W).cast("long").alias("bucket"),
    )
    joined = li.join(F.broadcast(tier_buckets), "bucket").where(
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") < F.col("hi"))
    )
    return joined.groupBy("tier", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("revenue"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
    )


# ------------------------------------------------------------ dim_scd2

# Sentinel "open interval" end (epoch seconds, year 2286): SCD2 readers
# filter `valid_from <= t < valid_to` without null-handling, and the
# driver hash needs a non-null BIGINT (a nullable one renders float64
# from the oracle).
SCD2_OPEN_END = 9_999_999_999


@REG.op(
    "dim_scd2",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             event_id, event_type
      FROM events
    ),
    r AS (
      SELECT user_id, ts_s, event_type,
             row_number() OVER (PARTITION BY user_id, ts_s
                                ORDER BY event_id DESC) AS rn
      FROM e
    ),
    s AS (SELECT user_id, ts_s, event_type FROM r WHERE rn = 1),
    c AS (
      SELECT user_id, ts_s, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts_s) AS prev_attr
      FROM s
    ),
    v AS (
      SELECT user_id, ts_s AS valid_from, event_type AS attr
      FROM c WHERE prev_attr IS NULL OR prev_attr <> event_type
    )
    SELECT user_id, attr,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY valid_from) AS BIGINT) AS version,
           valid_from,
           coalesce(lead(valid_from) OVER (PARTITION BY user_id
                                           ORDER BY valid_from),
                    {SCD2_OPEN_END}) AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) IS NULL AS is_current
    FROM v
    """,
)
def dim_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history: compress each user's event_type
    stream into change-versioned validity intervals [valid_from,
    valid_to) with a version number and an is_current flag — the
    standard slowly-changing-dimension build (Kimball SCD2), and the
    substrate a point-in-time-correct feature lookup (join_asof /
    `valid_from <= t < valid_to`) reads to avoid label leakage. The
    reference keeps only latest-state rows (keep-last dedup,
    core/etl.py:203-207); versioned history is a beyond-reference
    extension (SURVEY §2.12).

    Construction is change-detection over one (user_id)-keyed
    ordering: dedupe to one event per (user, second) keeping max
    event_id (the join_asof tie convention) via lag(ts_s) over a
    (ts_s, event_id DESC) sort — NOT a (user, second)-partitioned
    window, which would force a second exchange — then open a new
    version only where lag(attr) differs, and close each version with
    lead(valid_from). All three windows share the user_id
    partitioning: ONE shuffle and one sort per partition serve the
    whole plan (plan-asserted), linear at 100 TB.
    Open intervals get the SCD2_OPEN_END sentinel instead of null so
    readers range-filter without null branches (and the driver hash
    sees a non-null BIGINT)."""
    return scd2_versions(_events_epoch(spark, sf_dir))


def scd2_versions(e: DataFrame) -> DataFrame:
    """SCD2 construction over any (user_id, ts_s, event_id, event_type)
    frame — shared by the batch dim_scd2 op and the incremental
    streaming maintenance gate (evt_scd2_refresh_stream), which
    re-derives touched users' versions through this exact function so
    stream and batch cannot drift."""
    # rows arrive (ts_s asc, event_id desc): the FIRST row of each
    # second carries that second's max event_id, so "new second" ⇔
    # "survives the dedupe" — same user_id partitioning as the later
    # windows, no extra exchange
    wd = W.partitionBy("user_id").orderBy("ts_s", F.col("event_id").desc())
    s = (
        e.withColumn("prev_ts", F.lag("ts_s").over(wd))
        .where(F.col("prev_ts").isNull() | (F.col("prev_ts") != F.col("ts_s")))
        .select("user_id", "ts_s", "event_type")
    )
    wu = W.partitionBy("user_id").orderBy("ts_s")
    changed = s.withColumn("prev_attr", F.lag("event_type").over(wu)).where(
        F.col("prev_attr").isNull()
        | (F.col("prev_attr") != F.col("event_type"))
    )
    v = changed.select(
        "user_id",
        F.col("ts_s").alias("valid_from"),
        F.col("event_type").alias("attr"),
    )
    wv = W.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(wv)
    return v.select(
        "user_id",
        "attr",
        F.row_number().over(wv).cast("bigint").alias("version"),
        "valid_from",
        F.coalesce(nxt, F.lit(SCD2_OPEN_END)).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ------------------------------------------------------- join_pit_scd2

@REG.op(
    "join_pit_scd2",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             event_id, event_type, value
      FROM events
    ),
    r AS (
      SELECT user_id, ts_s, event_type,
             row_number() OVER (PARTITION BY user_id, ts_s
                                ORDER BY event_id DESC) AS rn
      FROM e
    ),
    s AS (SELECT user_id, ts_s, event_type FROM r WHERE rn = 1),
    c AS (
      SELECT user_id, ts_s, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts_s) AS prev_attr
      FROM s
    ),
    v AS (
      SELECT user_id, ts_s AS valid_from, event_type AS attr
      FROM c WHERE prev_attr IS NULL OR prev_attr <> event_type
    ),
    scd2 AS (
      SELECT user_id, attr,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY valid_from) AS BIGINT) AS version,
             valid_from,
             coalesce(lead(valid_from) OVER (PARTITION BY user_id
                                             ORDER BY valid_from),
                      {SCD2_OPEN_END}) AS valid_to
      FROM v
    ),
    p AS (
      SELECT user_id, ts_s, value FROM e
      WHERE event_type = '{ASOF_RIGHT_TYPE}'
    )
    SELECT d.user_id, d.version, d.attr,
           count(*) AS n_purchases,
           round(CAST(sum(CAST(p.value AS DECIMAL(18,4)))
                 AS DOUBLE), 4) AS total_value
    FROM p JOIN scd2 d
      ON p.user_id = d.user_id
     AND p.ts_s >= d.valid_from AND p.ts_s < d.valid_to
    GROUP BY 1, 2, 3
    """,
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time attribution against the SCD2 dimension: every
    purchase is credited to the dimension VERSION valid at its
    timestamp (`valid_from <= ts < valid_to`), aggregated to
    (user, version, attr) — the consumer half of the dim_scd2 /
    feature-store pattern, where reading the current state instead of
    the point-in-time version is exactly the label-leakage bug.

    The naive plan is a per-user interval theta join; the scalable
    formulation reuses the join_asof union-and-window trick: version
    openings enter as kind=0 rows at valid_from, purchases as kind=1
    at their ts, and one (user_id)-keyed window ordered by
    (ts_s, kind) carries (version, attr) forward — a same-second
    purchase sorts after the version opening, which implements the
    inclusive >= valid_from bound. dim_scd2's windows and this one
    share the user_id partitioning, so build + consume still run on
    ONE exchange before the final aggregation shuffle; no interval
    explosion at any scale. Value sums go through DECIMAL(18,4) so
    both engines aggregate exactly (double addition order is not
    deterministic)."""
    versions = dim_scd2(spark, sf_dir).select(
        "user_id",
        F.col("valid_from").alias("ts_s"),
        F.lit(0).alias("kind"),
        "version",
        "attr",
        F.lit(None).cast("double").alias("value"),
    )
    purchases = _events_epoch(spark, sf_dir).where(
        F.col("event_type") == ASOF_RIGHT_TYPE
    ).select(
        "user_id",
        "ts_s",
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("version"),
        F.lit(None).cast("string").alias("attr"),
        "value",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_s", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = versions.unionByName(purchases).select(
        "user_id",
        "kind",
        "value",
        F.last("version", ignorenulls=True).over(w).alias("v_version"),
        F.last("attr", ignorenulls=True).over(w).alias("v_attr"),
    )
    return (
        carried.where((F.col("kind") == 1) & F.col("v_version").isNotNull())
        .groupBy(
            "user_id",
            F.col("v_version").alias("version"),
            F.col("v_attr").alias("attr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("total_value"),
        )
    )


# ------------------------------------------------ join_interval_overlap

REPAIR_MAX_DAYS = 25  # synthetic repair-window length source (key % 25)
CAMPAIGN_DAYS = 20    # each quarterly campaign runs 21 days (s + 20)


@REG.op(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey AS a_id, o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS a_s,
               CAST(o_orderdate AS DATE) + CAST(o_orderkey % {REPAIR_MAX_DAYS} AS INT)
                 AS a_e
        FROM orders
    ), b AS (
        SELECT DISTINCT o_orderpriority AS priority,
               date_trunc('quarter', o_orderdate)::DATE AS b_s,
               date_trunc('quarter', o_orderdate)::DATE + {CAMPAIGN_DAYS} AS b_e
        FROM orders
    )
    SELECT a.priority, count(*) AS n_pairs,
           CAST(sum(date_diff('day', greatest(a_s, b_s), least(a_e, b_e)) + 1)
                AS BIGINT) AS overlap_days
    FROM a JOIN b ON a.priority = b.priority
                 AND a_s <= b_e AND b_s <= a_e
    GROUP BY 1
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval OVERLAP join — the third temporal-join shape
    (beside as-of and point-in-band): claim repair windows × quarterly
    campaign windows, counting overlapping pairs and total overlap days
    per priority. The naive plan is a theta join (O(n·m) candidate
    pairs per key); the scalable decomposition explodes EACH side to
    the calendar months its interval touches and equi-joins on
    (key, month) — every overlapping pair shares the month of the later
    start, so emitting a pair ONLY in that first common chunk
    (mo = greatest(trunc(a_s), trunc(b_s))) yields each pair exactly
    once with NO distinct/dedup shuffle afterwards.

    At 100 TB both sides shuffle on (priority, month) — bounded
    expansion (interval length / chunk width per row), uniform keys,
    and the exact overlap predicate re-checked after the equi-join.
    Chunk width trades expansion against join selectivity; months fit
    these interval lengths (≤ {REPAIR_MAX_DAYS} and {CAMPAIGN_DAYS + 1}
    days → ≤ 2 chunks per interval)."""
    o = load(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderkey").alias("a_id"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("a_s"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % REPAIR_MAX_DAYS).cast("int"),
        ).alias("a_e"),
    )
    b = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.trunc("o_orderdate", "quarter").alias("b_s"),
        )
        .distinct()
        .withColumn("b_e", F.date_add("b_s", CAMPAIGN_DAYS))
    )
    am = a.withColumn(
        "mo",
        F.explode(
            F.expr("sequence(trunc(a_s, 'MM'), trunc(a_e, 'MM'), interval 1 month)")
        ),
    )
    bm = b.withColumn(
        "mo",
        F.explode(
            F.expr("sequence(trunc(b_s, 'MM'), trunc(b_e, 'MM'), interval 1 month)")
        ),
    )
    pairs = am.join(bm, ["priority", "mo"]).where(
        (F.col("a_s") <= F.col("b_e"))
        & (F.col("b_s") <= F.col("a_e"))
        # first-common-chunk guard: count the pair only in the month of
        # the later start, so multi-month overlaps aren't double-counted
        & (
            F.col("mo")
            == F.greatest(F.trunc("a_s", "MM"), F.trunc("b_s", "MM"))
        )
    )
    return pairs.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.datediff(F.least("a_e", "b_e"), F.greatest("a_s", "b_s")) + 1
        ).alias("overlap_days"),
    )


# ------------------------------------------------- join_asof_tolerance

ASOF_TOLERANCE_S = 3600  # a feature older than this is unusable


@REG.op(
    "join_asof_tolerance",
    oracle=f"""
    SELECT * FROM ({REG.ops["join_asof"].oracle}) t
    WHERE gap_s <= {ASOF_TOLERANCE_S}
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND: the most recent purchase
    at-or-before each click counts only if it is at most
    {ASOF_TOLERANCE_S}s old — otherwise the click has NO match. This
    is the semantics real feature stores enforce (a point-in-time
    feature beyond its TTL must read as missing, not as a years-old
    value silently passing for fresh — the quiet train-serve-skew
    bug); the plain as-of join is the TTL=∞ special case.

    Because the as-of pick is the LATEST qualifying row, bounding
    staleness is exactly a post-selection filter on the gap — no
    second window needed, the one user-keyed union-window plan (see
    join_asof) is unchanged and Catalyst pushes the filter into its
    output projection."""
    return join_asof(spark, sf_dir).where(F.col("gap_s") <= ASOF_TOLERANCE_S)
