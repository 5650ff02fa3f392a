"""Relational core: scans, projections, filters, dedup flavors, joins,
unions, sorts/limits (SURVEY.md §2.1–2.4, §2.7).

Each op mirrors a reference behavior (file:line cited per op) on the
driver's TPC-H-ish tables. Spark side is DataFrame API so Catalyst gets
pushdown/pruning; the oracle is ANSI SQL for DuckDB.

Scale notes (100 TB): every query here is a narrow scan + pushed filter
or a single hash exchange. Joins against small dims use broadcast();
keep-last dedup is a window over the natural key, which shuffles once
on that key — the same strategy holds at cluster scale (AQE handles
skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()


# ---------------------------------------------------------------- scans

@REG.op(
    "src_parquet_part",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
    FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def src_parquet_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition/predicate-pushed parquet scan.

    Reference: pyarrow dataset filtered on 접수년/접수월
    (core/storage.py:171-193). Spark pushes year(o_orderdate)=1996 into
    the parquet scan (PushedFilters); on a hub partitioned by
    (year, month) this prunes directories.
    """
    return (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1996)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
    )


@REG.op(
    "src_parquet_cols",
    oracle="SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
)
def src_parquet_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan (reference core/storage.py:327-331 reads only
    [플랜트,접수년,접수월]). Catalyst prunes ReadSchema to 3 columns."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")


@REG.op(
    "src_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def src_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with explicit schema (reference core/etl.py:37-38,
    pd.read_csv utf-8-sig). Writes a temp CSV from the nation table,
    reads it back with spark.read.csv — no schema inference, canonical
    layer always declares types. The temp dir is unique per invocation
    so concurrent sessions (driver + pytest) can't race on a shared
    path, and only the 3 read-back columns are written."""
    from claim_analysis_engine_spark.tmputil import fresh_dir

    src = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    tmp = fresh_dir("cae_spark_nation_csv_")
    src.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    return spark.read.csv(
        tmp, header=True, schema="n_nationkey int, n_name string, n_regionkey int"
    )


@REG.op(
    "meta_rowcount",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
)
def meta_rowcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only row count (reference sums parquet footer num_rows,
    core/storage.py:248-262). Spark's count(*) over parquet is answered
    from footer stats via aggregate pushdown."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


# ---------------------------------------------- projection / filters

_CANON_SRC_SQL = {
    "reception_year": "CAST(year(o_orderdate) AS VARCHAR)",
    "reception_month": "CAST(month(o_orderdate) AS VARCHAR)",
    "reception_day": "CAST(day(o_orderdate) AS VARCHAR)",
    "business_unit": "CAST(o_custkey AS VARCHAR)",
    "claim_id": "CAST(o_orderkey AS VARCHAR)",
    "grade": "o_orderpriority",
    "plant": "o_orderstatus",
    "major_category": "o_orderpriority",
}


def _canon54_oracle() -> str:
    from claim_analysis_engine_spark.config import CANONICAL_COLS

    cols = ", ".join(
        f"{_CANON_SRC_SQL.get(c, 'CAST(NULL AS VARCHAR)')} AS \"{c}\""
        for c in CANONICAL_COLS
    )
    return f"SELECT {cols} FROM orders"


@REG.op("proj_canon54", oracle=_canon54_oracle())
def proj_canon54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalizing projection to the FULL 54-field contract via
    etl.canonicalize (reference core/etl.py:50-71 reindex to
    TARGET_54_COLS): the synthesized raw frame carries Korean source
    names (exercising the alias map) plus an extra column that must be
    dropped; the other 46 canonical fields materialize as typed nulls."""
    from claim_analysis_engine_spark import etl

    o = load(spark, sf_dir, "orders")
    raw = o.select(
        F.year("o_orderdate").cast("string").alias("접수년"),
        F.month("o_orderdate").cast("string").alias("접수월"),
        F.dayofmonth("o_orderdate").cast("string").alias("접수일"),
        F.col("o_custkey").cast("string").alias("사업부문"),
        F.col("o_orderkey").cast("string").alias("상담번호"),
        F.col("o_orderpriority").alias("등급기준"),
        F.col("o_orderstatus").alias("플랜트"),
        F.col("o_orderpriority").alias("대분류"),
        F.col("o_totalprice").cast("string").alias("비고"),  # extra — must be dropped
    )
    return etl.canonicalize(raw)


@REG.op(
    "etl_preprocess",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                  ELSE concat('  ', CAST(o_orderkey AS VARCHAR), ' ') END AS claim_id,
             CAST(year(o_orderdate) AS VARCHAR) AS ry,
             CAST(month(o_orderdate) AS VARCHAR) AS rm,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE CAST(day(o_orderdate) AS VARCHAR) END AS rd,
             CASE o_orderkey % 4
               WHEN 0 THEN strftime(CAST(o_orderdate AS DATE) - 30, '%Y/%m/%d')
               WHEN 1 THEN strftime(CAST(o_orderdate AS DATE) - 30, '%Y-%m-%d')
               WHEN 2 THEN strftime(CAST(o_orderdate AS DATE) - 30, '%Y.%m.%d')
               ELSE 'unknown' END AS mfg,
             0 AS load_seq
      FROM orders
      UNION ALL
      SELECT concat('  ', CAST(o_orderkey AS VARCHAR), ' '),
             CAST(year(o_orderdate) AS VARCHAR),
             CAST(month(o_orderdate) AS VARCHAR),
             '1', NULL, 1
      FROM orders WHERE o_orderkey % 50 = 0
    ),
    trimmed AS (
      SELECT trim(claim_id) AS claim_id, ry, rm, rd, mfg, load_seq
      FROM base WHERE claim_id IS NOT NULL AND trim(claim_id) <> ''
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY claim_id
                                     ORDER BY load_seq DESC) AS rn
        FROM trimmed
      ) WHERE rn = 1
    ),
    derived AS (
      SELECT claim_id,
             CASE WHEN ry IS NOT NULL AND rm IS NOT NULL AND rd IS NOT NULL
                  THEN make_date(CAST(ry AS INT), CAST(rm AS INT), CAST(rd AS INT))
             END AS reception_date,
             CAST(coalesce(try_strptime(mfg, '%Y/%m/%d'),
                           try_strptime(mfg, '%Y-%m-%d'),
                           try_strptime(mfg, '%Y.%m.%d')) AS DATE)
               AS manufacture_date,
             CAST(ry AS INT) AS reception_year, CAST(rm AS INT) AS reception_month
      FROM dedup
    )
    SELECT claim_id,
           strftime(reception_date, '%Y-%m-%d') AS reception_date,
           strftime(manufacture_date, '%Y-%m-%d') AS manufacture_date,
           CAST(date_diff('day', manufacture_date, reception_date) AS INT) AS lag_days,
           (reception_date IS NOT NULL AND manufacture_date IS NOT NULL
            AND date_diff('day', manufacture_date, reception_date) >= 0) AS lag_valid,
           reception_year, reception_month
    FROM derived
    """,
)
def etl_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed EP1 preprocess chain (reference core/etl.py:181-280
    via etl.preprocess): trim + null-drop claim ids, keep-LAST dedup on
    an explicit load_seq (a second upload of every 50th claim wins),
    y/m/d reception assembly with a missing-day path, 3-format cascade
    manufacture parse with an unparseable path, lag derivation
    (flagged, never dropped), partition-int coercion."""
    from claim_analysis_engine_spark import etl

    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    mfg_date = F.date_sub("o_orderdate", 30)
    base = o.select(
        F.when(k % 97 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("  "), k.cast("string"), F.lit(" "))
        ).alias("상담번호"),
        F.year("o_orderdate").cast("string").alias("접수년"),
        F.month("o_orderdate").cast("string").alias("접수월"),
        F.when(k % 13 == 0, F.lit(None)).otherwise(
            F.dayofmonth("o_orderdate").cast("string")
        ).alias("접수일"),
        F.when(k % 4 == 0, F.date_format(mfg_date, "yyyy/MM/dd"))
        .when(k % 4 == 1, F.date_format(mfg_date, "yyyy-MM-dd"))
        .when(k % 4 == 2, F.date_format(mfg_date, "yyyy.MM.dd"))
        .otherwise("unknown")
        .alias("제조일자"),
        F.lit(0).alias("load_seq"),
    )
    second_upload = o.where(k % 50 == 0).select(
        F.concat(F.lit("  "), k.cast("string"), F.lit(" ")).alias("상담번호"),
        F.year("o_orderdate").cast("string").alias("접수년"),
        F.month("o_orderdate").cast("string").alias("접수월"),
        F.lit("1").alias("접수일"),
        F.lit(None).cast("string").alias("제조일자"),
        F.lit(1).alias("load_seq"),
    )
    raw = base.unionByName(second_upload)
    canon = etl.canonicalize(raw, keep=("load_seq",))
    pre = etl.preprocess(canon, load_seq="load_seq")
    return pre.select(
        "claim_id",
        F.date_format("reception_date", "yyyy-MM-dd").alias("reception_date"),
        F.date_format("manufacture_date_parsed", "yyyy-MM-dd").alias("manufacture_date"),
        "lag_days",
        "lag_valid",
        "reception_year",
        "reception_month",
    )


@REG.op(
    "flt_notnull",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status
    FROM orders WHERE nullif(o_orderstatus, 'P') IS NOT NULL
    """,
)
def flt_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-drop on key column (reference dropna(subset=['상담번호']),
    core/etl.py:197-201). Testdata has no nulls, so nullif synthesizes
    them first — semantics under test are isNotNull pushdown."""
    df = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status")
    )
    return df.where(F.col("status").isNotNull())


@REG.op(
    "flt_isin",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
    """,
)
def flt_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate (reference 사업부문.isin(['식품','B2B식품']) mode
    filters, pages/3_플랜트_분석.py:117-156)."""
    return (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") == "F")
        )
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
    )


@REG.op(
    "flt_eq",
    oracle="SELECT event_id, event_type, user_id FROM events WHERE event_type = 'purchase'",
)
def flt_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter (reference plant filter, pages/4_예측_시뮬레이션.py:60)."""
    return (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "event_type", "user_id")
    )


@REG.op(
    "flt_range_date",
    oracle="""
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-06-30'
    """,
)
def flt_range_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range predicate (reference 접수일자 between start/end,
    pages/3_플랜트_분석.py:82-86)."""
    return (
        load(spark, sf_dir, "lineitem")
        .withColumn("ship_date_d", F.col("l_shipdate").cast("date"))
        .where(F.col("ship_date_d").between("1997-01-01", "1997-06-30"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("ship_date_d", "yyyy-MM-dd").alias("ship_date"),
        )
    )


@REG.op(
    "flt_rolling_30d",
    oracle="""
    WITH mx AS (SELECT max(CAST(l_shipdate AS DATE)) AS mx FROM lineitem)
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem, mx WHERE CAST(l_shipdate AS DATE) >= mx.mx - INTERVAL 30 DAY
    """,
)
def flt_rolling_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day window off the data's max date (reference LOT
    alert window `>= max_date-30d`, app.py:443-446). max() is computed
    as a 1-row subquery and broadcast into the filter — no collect."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "ship_date", F.col("l_shipdate").cast("date")
    )
    mx = li.agg(F.date_sub(F.max("ship_date"), 30).alias("cutoff"))
    return (
        li.join(F.broadcast(mx))
        .where(F.col("ship_date") >= F.col("cutoff"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("ship_date", "yyyy-MM-dd").alias("ship_date"),
        )
    )


@REG.op(
    "fill_na_label",
    oracle="""
    SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'P'), '미지정') AS status_label
    FROM orders
    """,
)
def fill_na_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null → '미지정' label on pivot dims (reference fillna('미지정'),
    pages/3_플랜트_분석.py:260-263)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("미지정")).alias(
            "status_label"
        ),
    )


@REG.op(
    "num_coerce",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
           TRY_CAST(o_orderstatus AS INTEGER) AS bogus_num
    FROM orders
    """,
)
def num_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant numeric coercion: non-numeric → null, never error
    (reference pd.to_numeric(errors='coerce'), core/etl.py:217-219).
    try_cast keeps this ANSI-safe on Spark 4."""
    df = load(spark, sf_dir, "orders")
    return df.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("priority_num"),
        F.col("o_orderstatus").try_cast("int").alias("bogus_num"),
    )


# ------------------------------------------------------------- dedup

@REG.op(
    "dedup_fullrow",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem",
)
def dedup_fullrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-row distinct (reference drop_duplicates() post-load,
    core/etl.py:134-136). One hash exchange on all columns."""
    return load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    ).distinct()


@REG.op(
    "dedup_keylast",
    oracle="""
    SELECT o_custkey, o_orderkey AS last_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS last_order_date
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_keylast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-dedup keep-last (reference dedups 상담번호 keep='last' on
    upload order, core/etl.py:203-209). pandas relies on implicit row
    order; here the order is an explicit, deterministic sort key
    (date desc, id desc) — the SURVEY §7 'hard parts' fix."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_order_date"),
        )
    )


@REG.op(
    "dedup_merge",
    oracle="""
    WITH existing AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS load_seq
      FROM orders WHERE year(o_orderdate) <= 1997
    ), incoming AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS load_seq
      FROM orders WHERE year(o_orderdate) >= 1997
    ), unioned AS (
      SELECT * FROM existing UNION ALL SELECT * FROM incoming
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice AS total_price
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY load_seq DESC) AS rn
      FROM unioned
    ) WHERE rn = 1
    """,
)
def dedup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-upsert: union(existing, incoming) → keep-last by key with
    explicit load_seq (reference hub merge concat+dedup,
    core/storage.py:102-127). 1997 rows overlap both sides, so the
    incoming copy must win. At scale this is storage.merge_upsert with
    dynamic partition overwrite instead of a full rewrite.

    r14 (guide §2.3/§2.4): the union of two filters of the SAME table
    scanned orders twice and fed a window (sort + row_number) — the
    before-plan (plans/r14/dedup_merge_before.txt) shows 2 scans, a
    sort on both sides of the exchange, and WindowGroupLimit passes.
    One scan now materializes both branch memberships per row
    (explode of the compacted [existing?0, incoming?1] array — the
    same union multiset), and keep-last-by-seq becomes max_by, a hash
    aggregate that partial-aggregates map-side instead of sorting.
    row_number ties cannot occur (load_seq is unique per key within
    each branch), so max_by is exactly the rn=1 row."""
    orders = load(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    seqs = F.array_compact(
        F.array(
            F.when(y <= 1997, F.lit(0)),
            F.when(y >= 1997, F.lit(1)),
        )
    )
    unioned = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.explode(seqs).alias("load_seq"),
    )
    return (
        unioned.groupBy("o_orderkey")
        .agg(
            F.max_by(
                F.struct("o_orderstatus", "o_totalprice"), "load_seq"
            ).alias("_last")
        )
        .select(
            "o_orderkey",
            F.col("_last.o_orderstatus").alias("o_orderstatus"),
            F.col("_last.o_totalprice").alias("total_price"),
        )
    )


@REG.op(
    "dedup_audit",
    oracle="""
    SELECT o_custkey AS dup_key, count(*) AS n_rows
    FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
)
def dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness audit: keys appearing more than once
    (reference check_duplication.py:44-77 lists duplicate 상담번호)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("dup_key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


# -------------------------------------------------------------- joins

@REG.op(
    "join_claims_sales",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_claims_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join fact → small dim (reference claims⟕sales on
    [플랜트,년,월], pages/2_매출수량_관리.py:88). Dim side broadcast —
    no shuffle of the 100 TB fact table."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left"
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")


@REG.op(
    "join_latest_id",
    oracle="""
    WITH latest AS (
      SELECT o_custkey, o_orderkey AS latest_orderkey FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name, l.latest_orderkey
    FROM customer c LEFT JOIN latest l ON c.c_custkey = l.o_custkey
    """,
)
def join_latest_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key latest-row pick then left join back (reference latest
    sales ID per plant, pages/2_매출수량_관리.py:81-85)."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("latest_orderkey"))
    )
    customer = load(spark, sf_dir, "customer")
    return customer.join(latest, customer.c_custkey == latest.o_custkey, "left").select(
        "c_custkey", "c_name", "latest_orderkey"
    )


@REG.op(
    "join_anti_sync",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: keys on one side missing from the other — the idiomatic
    form of the reference's Smart Sync 'claim periods missing from
    sales' (pages/2_매출수량_관리.py:66-99; SURVEY §2.4 note)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@REG.op(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: customers having ≥1 urgent order (EXISTS). Completes
    the set-membership family next to join_anti_sync."""
    customer = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@REG.op(
    "union_schema_align",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name,
           c_acctbal AS balance, CAST(NULL AS VARCHAR) AS priority
    FROM customer
    UNION ALL
    SELECT o_orderkey AS entity_key, CAST(NULL AS VARCHAR) AS entity_name,
           CAST(NULL AS DOUBLE) AS balance, o_orderpriority AS priority
    FROM orders
    """,
)
def union_schema_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union: both sides gain each other's missing columns
    as typed nulls (reference concat with add-missing-cols,
    core/storage.py:107-119) — unionByName(allowMissingColumns=True)."""
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("balance"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("entity_key"),
        F.col("o_orderpriority").alias("priority"),
    )
    return customer.unionByName(orders, allowMissingColumns=True)


@REG.op(
    "union_append",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain row append (reference CSV merge of new sales rows,
    pages/2_매출수량_관리.py:190-202)."""
    orders = load(spark, sf_dir, "orders")
    a = orders.where(F.year("o_orderdate") == 1995).select("o_orderkey", "o_orderstatus")
    b = orders.where(F.year("o_orderdate") == 1996).select("o_orderkey", "o_orderstatus")
    return a.union(b)


# ------------------------------------------------------ sort / limit

@REG.op(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           o_totalprice AS total_price
    FROM orders
    ORDER BY o_orderstatus ASC, total_price DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit (reference sort [플랜트,년,월] / score desc,
    core/storage.py:267, app.py:322). Tie-broken by key so the LIMIT
    is deterministic. Spark executes this as TakeOrderedAndProject —
    no global sort materialization."""
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.col("o_totalprice").alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("total_price").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@REG.op(
    "topk_per_group",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice AS total_price
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderstatus
        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranked window (reference top-2 categories /
    champion pick, app.py:53, core/engine/trainer.py:536-542)."""
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.col("o_totalprice").alias("total_price"),
        )
    )


@REG.op(
    "limit_head",
    oracle="""
    WITH monthly AS (
      SELECT o_orderstatus AS status, year(o_orderdate) AS y,
             month(o_orderdate) AS m, count(*) AS n
      FROM orders GROUP BY 1, 2, 3
    )
    SELECT status, y, m, n FROM (
      SELECT *, row_number() OVER (PARTITION BY status
                                   ORDER BY y DESC, m DESC) AS rk
      FROM monthly
    ) WHERE rk <= 3
    """,
)
def limit_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group tail-k slice (reference .tail(3)/.tail(12) recent-
    month windows, app.py:303, pages/4_예측_시뮬레이션.py:232): the last 3
    months of every series via a rank window — the distributed form of
    positional tail slicing; head/limit is TakeOrderedAndProject in
    sort_multi."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("status").orderBy(F.col("y").desc(), F.col("m").desc())
    return (
        monthly.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("status", "y", "m", "n")
    )


@REG.op(
    "merge_cdc_tombstone",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             'U' AS op, 0 AS load_seq
      FROM orders WHERE year(o_orderdate) <= 1997
    ),
    changes AS (
      SELECT o_orderkey,
             o_orderstatus,
             round(o_totalprice * 1.1, 2) AS o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
             1 AS load_seq
      FROM orders WHERE year(o_orderdate) = 1997
    ),
    unioned AS (SELECT * FROM base UNION ALL SELECT * FROM changes),
    latest AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY load_seq DESC) AS rn
      FROM unioned
    )
    SELECT year(o.o_orderdate) AS y,
           count(*) AS n_live,
           CAST(sum(CASE WHEN l.load_seq = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_updated
    FROM latest l JOIN orders o ON o.o_orderkey = l.o_orderkey
    WHERE l.rn = 1 AND l.op <> 'D'
    GROUP BY 1
    """,
)
def merge_cdc_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply-changes with DELETE tombstones — the lakehouse MERGE
    contract (Delta/Iceberg MERGE INTO ... WHEN MATCHED DELETE) that
    plain keep-last upsert (dedup_merge) can't express: a change batch
    carries op ∈ {U, D}; keep-last picks each key's latest version,
    then tombstoned keys drop entirely. Same single keyed window as
    the upsert — deletes add no extra shuffle, just a post-filter on
    the surviving row's op — so the CDC path scales identically to the
    append path. The result profiles live rows per original year with
    the update count, proving both the in-place updates (1997 rows not
    divisible by 7 got new prices) and the deletes (every 7th 1997 key
    is gone)."""
    orders = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = (
        orders.where(F.year("o_orderdate") <= 1997)
        .select(*cols)
        .withColumn("op", F.lit("U"))
        .withColumn("load_seq", F.lit(0))
    )
    changes = (
        orders.where(F.year("o_orderdate") == 1997)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        )
        .withColumn(
            "op",
            F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U"),
        )
        .withColumn("load_seq", F.lit(1))
    )
    unioned = base.unionByName(changes)
    w = W.partitionBy("o_orderkey").orderBy(F.col("load_seq").desc())
    live = (
        unioned.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("o_orderkey", "load_seq")
    )
    return (
        live.join(orders.select("o_orderkey", "o_orderdate"), "o_orderkey")
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum(F.when(F.col("load_seq") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_updated"),
        )
    )


@REG.op(
    "join_semi_active",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1997
    )
    """,
)
def join_semi_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers with ≥1 order in 1997 — the EXISTS
    shape. Semi joins matter at scale because the probe side streams
    through without materializing matches (no row multiplication, no
    columns from the build side carried through the shuffle); the
    year filter pushes into the orders scan before the exchange."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1997)
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@REG.op(
    "join_anti_orphans",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus
    FROM orders o
    WHERE year(o.o_orderdate) = 1998
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
      )
    """,
)
def join_anti_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: 1998 orders with no lineitem — the referential-
    integrity audit (NOT EXISTS). Anti joins are the data-quality
    primitive a 100 TB ingest pipeline runs after every load; like the
    semi form they never multiply rows and carry only the probe side's
    columns through the plan."""
    o = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1998)
        .select("o_orderkey", "o_orderstatus")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")


# ------------------------------------------------------ join_star_flatten

@REG.op(
    "join_star_flatten",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           year(o.o_orderdate) AS y,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2, 3
    """,
)
def join_star_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full star-schema flatten: fact → customer → nation → region in
    one pass, revenue rollup at (region, nation, year) — the
    denormalized mart every BI layer builds first. All three dims are
    explicitly broadcast, so the plan is ONE fact scan with three
    chained broadcast-hash joins and a single aggregate exchange on
    the (tiny) group key: zero fact shuffles before the rollup. At
    100 TB the dims (thousands to millions of rows) still broadcast;
    if customer ever outgrows that, the fix is pre-joining
    nation+region INTO customer (dims compose broadcast-side) before
    the one big join — never three sequential fact shuffles."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("y"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("revenue"),
        )
    )


# --------------------------------------------------- cdc_extract_roundtrip

CDC_SIG_MOD = 2305843009213693951  # 2^61 - 1: keeps the signature in bigint


@REG.op(
    "cdc_extract_roundtrip",
    oracle=f"""
    WITH s1 AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents
        FROM orders WHERE year(o_orderdate) <= 1997
    ), s2 AS (
        SELECT k, CASE WHEN k % 7 = 0 THEN cents + 1000 ELSE cents END AS cents
        FROM s1 WHERE k % 13 <> 0
        UNION ALL
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM orders WHERE year(o_orderdate) = 1998
    ), counts AS (
        SELECT 'I' AS op,
               (SELECT count(*) FROM orders WHERE year(o_orderdate) = 1998)
                 AS n_changes
        UNION ALL
        SELECT 'D', (SELECT count(*) FROM s1 WHERE k % 13 = 0)
        UNION ALL
        SELECT 'U', (SELECT count(*) FROM s1
                     WHERE k % 7 = 0 AND k % 13 <> 0)
    ), sig AS (
        SELECT CAST(sum(k * cents) % {CDC_SIG_MOD} AS BIGINT) AS s,
               count(*) AS n
        FROM s2
    )
    SELECT c.op, CAST(c.n_changes AS BIGINT) AS n_changes,
           sig.s AS recon_sig, sig.s AS target_sig,
           CAST(sig.n AS BIGINT) AS recon_rows, TRUE AS recon_matches
    FROM counts c, sig
    """,
)
def cdc_extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC EXTRACT — the changefeed GENERATOR merge_cdc_tombstone
    consumes: diff two table snapshots into insert/update/delete
    change rows (one full-outer key join; I = new key, D = vanished
    key, U = shared key with a differing payload), then prove the
    extract by ROUND-TRIP: applying the extracted changes back onto
    snapshot 1 must reconstruct snapshot 2 exactly, witnessed by a
    key-weighted content signature (Σ key·cents mod 2⁶¹−1 — one
    transposed digit anywhere breaks it). The op emits the change
    profile AND the reconstruction verdict; the oracle computes the
    expected counts from the snapshot definitions and the signature
    from snapshot 2 directly, so a wrong diff, a missed delete, or a
    double-applied update all hash-mismatch at the gate.

    This is snapshot-diff CDC (Debezium-style log tailing without a
    log): the pattern for sources that only publish full dumps. The
    snapshots here are deterministic transforms of orders (s2 = s1
    minus every 13th key, every 7th key's price +10.00, plus the 1998
    inserts) so both engines build identical inputs.

    Scale: one full-outer join on the snapshot key + two aggregates;
    the changefeed is |changes| rows, never |table|; the signature is
    an integer aggregate (map-side combinable, overflow-safe via the
    Mersenne modulus on a decimal accumulator)."""
    orders = load(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    s1 = orders.where(F.year("o_orderdate") <= 1997).select(
        F.col("o_orderkey").alias("k"), cents.alias("cents")
    )
    s2 = (
        s1.where(F.col("k") % 13 != 0)
        .select(
            "k",
            F.when(F.col("k") % 7 == 0, F.col("cents") + 1000)
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .unionByName(
            orders.where(F.year("o_orderdate") == 1998).select(
                F.col("o_orderkey").alias("k"), cents.alias("cents")
            )
        )
    )

    # ------------------------------------------------------- extract
    old = s1.select(F.col("k"), F.col("cents").alias("old_cents"))
    new = s2.select(F.col("k"), F.col("cents").alias("new_cents"))
    diff = old.join(new, "k", "full_outer")
    # r14 (guide §2.4): the changefeed feeds THREE consumers (the
    # apply anti-join, the non-delete re-insert union, and the change
    # counts) — without reuse each consumer re-executes the
    # full-outer snapshot diff. |changes| is change-proportional,
    # never table-proportional, so materializing it is the
    # scale-correct choice at 100 TB (the snapshots themselves stay
    # unmaterialized). r15 hygiene (the r14 verdict flag): the r14
    # `.cache()` was never unpersisted and Spark's CacheManager
    # matches by canonicalized plan, so bench repeat runs replayed
    # run 1's materialized diff. localCheckpoint gives the same
    # single-execution sharing WITHIN one invocation (all three
    # consumers read the persisted RDD blocks) but registers nothing
    # in the CacheManager — every fresh invocation recomputes the
    # diff, and the blocks die with the DataFrame via ContextCleaner.
    changes = (
        diff.select(
            "k",
            F.when(F.col("old_cents").isNull(), "I")
            .when(F.col("new_cents").isNull(), "D")
            .when(F.col("old_cents") != F.col("new_cents"), "U")
            .alias("op"),
            F.col("new_cents"),
        )
        .where(F.col("op").isNotNull())
        .localCheckpoint(eager=False)
    )

    # ------------------------------------- apply back onto snapshot 1
    touched = changes.select("k", "op")
    recon = (
        s1.join(touched, "k", "left_anti")  # untouched rows carry over
        .unionByName(
            changes.where(F.col("op") != "D").select(
                "k", F.col("new_cents").alias("cents")
            )
        )
    )

    def sig(df: DataFrame, s_name: str, n_name: str) -> DataFrame:
        return df.agg(
            F.pmod(
                F.sum(
                    F.col("k").cast("decimal(38,0)")
                    * F.col("cents").cast("decimal(38,0)")
                ),
                F.lit(CDC_SIG_MOD).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias(s_name),
            F.count(F.lit(1)).alias(n_name),
        )

    recon_sig = sig(recon, "recon_sig", "recon_rows")
    target_sig = sig(s2, "target_sig", "target_rows")
    counts = changes.groupBy("op").agg(F.count(F.lit(1)).alias("n_changes"))
    return (
        counts.crossJoin(F.broadcast(recon_sig))
        .crossJoin(F.broadcast(target_sig))
        .select(
            "op",
            "n_changes",
            "recon_sig",
            "target_sig",
            "recon_rows",
            (
                (F.col("recon_sig") == F.col("target_sig"))
                & (F.col("recon_rows") == F.col("target_rows"))
            ).alias("recon_matches"),
        )
    )
