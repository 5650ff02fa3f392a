"""Explicit at-scale execution patterns, demonstrated as verifiable
operators: bucketed co-located joins, skew salting, and storage-level
partition pruning. Each op's RESULT is oracle-checked; its PLAN is
asserted by tests/test_scale_patterns.py (no Exchange before a
bucketed join; salted pre-aggregation stages).

These complement AQE rather than replace it: AQE handles runtime skew
splitting and small-partition coalescing, but bucket layout and
deliberate two-stage aggregation are design-time decisions a 100 TB
deployment makes up front.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()

N_BUCKETS = 8
N_SALTS = 16


# ------------------------------------------------------ join_bucketed

@REG.op(
    "join_bucketed",
    oracle="""
    SELECT o.o_custkey, count(*) AS n_orders,
           round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join via BUCKETED tables: both sides are written
    bucketBy(8, orderkey) + sortBy, so the join needs NO shuffle of
    either side — the layout investment that makes repeated fact-fact
    joins affordable at 100 TB (verified by plan assertion in tests:
    zero Exchange between the scans and the SortMergeJoin). Tables get
    unique names per invocation so concurrent sessions can't collide."""
    tag = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"b_orders_{tag}", f"b_lineitem_{tag}"
    (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", F.col("l_quantity").cast("decimal(18,2)").alias("qty"))
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(t_lineitem)
    )
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("qty").cast("double"), 2).alias("total_qty"),
        )
    )


# -------------------------------------------------------- agg_salted

@REG.op(
    "agg_salted",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total
    FROM orders GROUP BY 1
    """,
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation: o_orderstatus is heavily skewed
    (two values carry ~97% of rows), so stage 1 aggregates on
    (key, salt) — spreading each hot key over 16 reducers — and stage 2
    folds the partials. Decimal sums make the result identical to the
    direct aggregation regardless of folding order. (Spark's map-side
    partial aggregation covers this case too; explicit salting is the
    pattern for the cases it can't, e.g. collect_list/exact distinct
    on skewed keys.)"""
    o = load(spark, sf_dir, "orders").withColumn(
        "salt", (F.col("o_orderkey") % N_SALTS).cast("int")
    )
    partial = o.groupBy("o_orderstatus", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("pt"),
    )
    return partial.groupBy("o_orderstatus").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pt").cast("double"), 2).alias("total"),
    )


# ----------------------------------------------------- prune_partition

@REG.op(
    "prune_partition",
    oracle="""
    SELECT o_orderstatus, count(*) AS n FROM orders
    WHERE year(o_orderdate) = 1997 AND month(o_orderdate) = 6
    GROUP BY 1
    """,
)
def prune_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned read against a freshly written (year, month)
    hub: the filter lands on partition COLUMNS, so the scan lists only
    the 1997/06 directory — the access pattern every dashboard query
    rides on (reference filtered dataset scans,
    core/storage.py:171-193). Plan-asserted in tests: the scan's
    partition filters carry the year/month predicates."""
    hub = tempfile.mkdtemp(prefix="cae_spark_prune_")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
    )
    o.write.partitionBy("y", "m").mode("overwrite").parquet(hub)
    back = spark.read.parquet(hub).where((F.col("y") == 1997) & (F.col("m") == 6))
    return back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------- approx aggregates

@REG.op("agg_approx_distinct")  # rows-only: HLL estimates are engine-
# specific; tests/test_scale_patterns.py bounds the relative error vs
# the exact count instead
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counting per group (rsd 2%) beside the
    exact count — at 100 TB the exact distinct is a full shuffle of the
    key universe while the sketch is a fixed few-KB buffer per group
    that map-side combines; this op reports both so the error is
    observable, a production pipeline keeps only the sketch."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )


@REG.op("agg_sketch_quantiles")  # rows-only: approx quantile sketches
# are engine-specific; error bounded in tests vs exact percentiles
def agg_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (percentile_approx, accuracy 10000)
    over order totals per status, beside the exact percentile — the
    distributed substitute for exact quantiles when a group's values
    no longer fit one reducer (the exact path holds the whole group's
    values in memory; the sketch is bounded and map-side mergeable)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus", F.col("o_totalprice").cast("double").alias("v")
    )
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile_approx("v", 0.5, 10000), 2).alias("approx_p50"),
        F.round(F.percentile("v", F.lit(0.5)), 2).alias("exact_p50"),
        F.round(F.percentile_approx("v", 0.99, 10000), 2).alias("approx_p99"),
        F.round(F.percentile("v", F.lit(0.99)), 2).alias("exact_p99"),
    )
