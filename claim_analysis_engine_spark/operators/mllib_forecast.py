"""MLlib forecasting twin (pyspark.ml) — the GBDT half of §2.10 run
as ONE distributed model instead of per-series Python fits.

The reference's CatBoost slot (core/engine/models.py:206-303) fits a
boosted-tree regressor per series on lag features and predicts
recursively, feeding its own outputs forward. operators/tsforecast.py
re-expresses that shape faithfully (per-series numpy GBDT via
fanout_apply). This module adds the architecture Spark uniquely
enables and the baseline brief names (BASELINE.json: "DataFrame API +
MLlib for forecasting"): a SINGLE pyspark.ml GBTRegressor trained
JVM-side across ALL series' lag-feature rows at once — a global model
that pools cross-series structure (the "one model over all SKUs"
pattern of M5-winning forecasters) and trains distributed with no
Python in the loop.

Pipeline, all DataFrame-native until the `.fit`:
  zero-filled monthly series (risk._series, the substrate every §2.9
  and §2.10 op shares) → lag features (window lag 1,2,3,12 + month-of-
  year) → temporal split (last HORIZON months held out, exactly
  tsforecast.ml_split's rule) → VectorAssembler → GBTRegressor.fit →
  RECURSIVE multi-step transform: horizon step h's lag-1..3 features
  come from the model's own h-1 predictions (union-appended to the
  history frame), lag-12 from actuals — byte-for-byte the reference's
  recursive predict discipline, expressed as h tiny broadcast joins +
  one JVM transform per step instead of a Python loop.

Backtest: the SAME recursion replayed from the train boundary against
the held-out months gives an honest per-series RMSE (recursive, not
teacher-forced), which prices the ±1.96·RMSE bands — reference
pages/4:321-324 CI arithmetic, same as every other forecast op here.

Scale: the fact table collapses to (keys × months) before any ML; the
lag frame is series-count × months rows. Training is MLlib's
distributed histogram GBT — at 1M series the fit is a real cluster
job; the recursion is HORIZON broadcast joins over a keys-sized frame.
All model state lives JVM-side; zero Python workers anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from claim_analysis_engine_spark.operators.risk import _SERIES_CTE, _series
from claim_analysis_engine_spark.registry import OpRegistry

REG = OpRegistry()

HORIZON = 3
LAGS = (1, 2, 3, 12)
# training needs at least one row with a non-null lag-12 STRICTLY
# inside the train span (m - HORIZON months): m >= max(LAGS) + HORIZON + 1
MIN_MONTHS = max(LAGS) + HORIZON + 1
_FEATURES = [f"lag{L}" for L in LAGS] + ["moy"]


def _lag_features(s: DataFrame) -> DataFrame:
    """Series frame → supervised lag-feature frame. idx is the global
    month ordinal (every series shares the zero-filled spine, so idx
    and month are in global 1:1 correspondence)."""
    key = W.partitionBy("status", "priority").orderBy("month")
    out = s.withColumn("idx", F.row_number().over(key))
    for lag in LAGS:
        out = out.withColumn(f"lag{lag}", F.lag("n", lag).over(key).cast("double"))
    return out.withColumn("moy", F.month("month").cast("double")).withColumn(
        "n", F.col("n").cast("double")
    )


def _fit_gbt(train: DataFrame):
    """Assemble + fit the global GBT. Import inside: pyspark.ml is in
    the sandbox (Spark 4.1.2) but keeping the import local means a
    stripped pyspark build degrades exactly one op family."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    assembler = VectorAssembler(inputCols=_FEATURES, outputCol="features")
    gbt = GBTRegressor(
        featuresCol="features",
        labelCol="n",
        predictionCol="prediction",
        maxDepth=3,
        maxIter=20,
        stepSize=0.1,
        seed=42,
    )
    return assembler, gbt.fit(assembler.transform(train.dropna(subset=_FEATURES)))


def _recursive_forecast(
    assembler,
    model,
    hist: DataFrame,
    start_idx: int,
    first_month,
    steps: int = HORIZON,
) -> DataFrame:
    """The reference's recursive multi-step predict, distributed:
    step h's feature row per series takes lag-L from the history frame
    at idx (start_idx + h − L) — which for L < h is the model's OWN
    prior prediction, union-appended below. Returns (status, priority,
    h, yhat). `first_month` anchors month-of-year for future ordinals.

    Per step: ONE keys-grain aggregation pivots the lag window into
    feature columns (cheaper in Catalyst than a join per lag), one JVM
    transform scores it, and the keys-sized prediction frame is
    localCheckpoint'ed EAGERLY — each step executes once on the cached
    history instead of re-deriving the whole transform chain every
    time a downstream action touches it (the recursion is consumed
    twice: RMSE join + final band join)."""
    preds: DataFrame | None = None
    cur = hist
    for h in range(1, steps + 1):
        step_idx = start_idx + h
        feats = (
            cur.where(
                (F.col("idx") >= step_idx - max(LAGS)) & (F.col("idx") < step_idx)
            )
            .groupBy("status", "priority")
            .agg(
                *[
                    F.max(
                        F.when(F.col("idx") == step_idx - lag, F.col("n"))
                    ).alias(f"lag{lag}")
                    for lag in LAGS
                ]
            )
            .withColumn(
                "moy",
                F.month(F.add_months(F.lit(first_month), step_idx - 1)).cast(
                    "double"
                ),
            )
        )
        p = (
            model.transform(assembler.transform(feats))
            .select(
                "status",
                "priority",
                F.greatest(F.lit(0.0), F.col("prediction")).alias("yhat"),
            )
            .localCheckpoint()  # eager: keys-sized, executes the step once
        )
        row = p.select("status", "priority", F.lit(h).alias("h"), "yhat")
        preds = row if preds is None else preds.unionByName(row)
        cur = cur.unionByName(
            p.select(
                "status",
                "priority",
                F.lit(step_idx).alias("idx"),
                F.col("yhat").alias("n"),
            )
        )
    assert preds is not None
    return preds


# materialized forecasts per (session, sf_dir): the frame is keys ×
# HORIZON rows, and BOTH ops (forecast + contract) need it — one
# training pays for the lifecycle, the memoized-family pattern
# (rs_wrapper, p6, CC labels); bench surfaces the cold cost via the
# warm-up pass
_GBT_MEMO: dict[tuple, tuple] = {}
_GBT_MEMO_MAX = 2

# the fitted (assembler, model) pair per (session, sf_dir): JVM model
# objects are session-bound, which is exactly what session_memo_key
# keys on; the persistence op reads the SAME model the forecast ops
# trained instead of paying a second fit
_GBT_MODEL_MEMO: dict[tuple, tuple] = {}

# per-series backtest RMSE rows (keys-sized) from the same training —
# the pooled model's entry fee for the 4-way champion election
_GBT_RMSE_MEMO: dict[tuple, tuple] = {}

# the finished 4-way election board (keys × 4 rows) — the election op
# and its contract pay the per-series tuning fanout once per session
_CH4_MEMO: dict[tuple, tuple] = {}


def _gbt_forecast_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared engine for both ops: train, backtest recursively over the
    held-out months, forecast HORIZON months ahead, band with
    ±1.96·backtest-RMSE clipped at 0. Result memoized per (session,
    sf_dir) — see _GBT_MEMO."""
    from claim_analysis_engine_spark.tables import session_memo_key

    memo_key = session_memo_key(spark, sf_dir)
    if memo_key in _GBT_MEMO:
        rows, schema = _GBT_MEMO[memo_key]
        return spark.createDataFrame(rows, schema)
    rows, schema = _train_and_forecast(spark, sf_dir)
    if len(_GBT_MEMO) >= _GBT_MEMO_MAX:
        _GBT_MEMO.pop(next(iter(_GBT_MEMO)))
    _GBT_MEMO[memo_key] = (rows, schema)
    return spark.createDataFrame(rows, schema)


def _train_and_forecast(spark: SparkSession, sf_dir: str):
    """Training core → (collected forecast rows, schema)."""
    # the lag frame is bounded (series-keys × months) and consumed by
    # the fit, both recursions, and the RMSE join — cache once, release
    # after the series-grain result is materialized below
    s = _lag_features(_series(spark, sf_dir)).cache()
    out_schema = (
        "status string, priority string, h int, yhat double, "
        "ci_lo double, ci_hi double, model string"
    )
    try:
        bounds = s.agg(
            F.max("idx").alias("m"), F.min("month").alias("first_month")
        ).first()
        m, first_month = bounds["m"], bounds["first_month"]
        if m is None or m < MIN_MONTHS:  # the oracle's eligibility mirror
            return [], out_schema

        train = s.where(F.col("idx") <= m - HORIZON)
        assembler, model = _fit_gbt(train)
        from claim_analysis_engine_spark.tables import session_memo_key

        if len(_GBT_MODEL_MEMO) >= _GBT_MEMO_MAX:
            _GBT_MODEL_MEMO.pop(next(iter(_GBT_MODEL_MEMO)))
        _GBT_MODEL_MEMO[session_memo_key(spark, sf_dir)] = (assembler, model)

        hist = s.select("status", "priority", "idx", "n")
        # honest backtest: recursion replayed from the train boundary,
        # so held-out months are predicted exactly the way the future is
        bt = _recursive_forecast(
            assembler,
            model,
            hist.where(F.col("idx") <= m - HORIZON),
            m - HORIZON,
            first_month,
        )
        actual = hist.where(F.col("idx") > m - HORIZON).select(
            "status",
            "priority",
            (F.col("idx") - (m - HORIZON)).alias("h"),
            F.col("n").alias("y"),
        )
        rmse = (
            bt.join(actual, ["status", "priority", "h"])
            .groupBy("status", "priority")
            .agg(
                F.sqrt(F.avg((F.col("y") - F.col("yhat")) ** 2)).alias("bt_rmse")
            )
        )
        # materialize the keys-sized RMSE once: the band join below AND
        # the 4-way champion election (ml_champion4) both consume it —
        # rows into the memo, frame rebuilt from them (gate-safe)
        rmse_rows, rmse_schema = rmse.collect(), rmse.schema
        if len(_GBT_RMSE_MEMO) >= _GBT_MEMO_MAX:
            _GBT_RMSE_MEMO.pop(next(iter(_GBT_RMSE_MEMO)))
        _GBT_RMSE_MEMO[session_memo_key(spark, sf_dir)] = (
            rmse_rows,
            rmse_schema,
        )
        rmse = spark.createDataFrame(rmse_rows, rmse_schema)

        fc = _recursive_forecast(assembler, model, hist, m, first_month)
        result = fc.join(F.broadcast(rmse), ["status", "priority"]).select(
            "status",
            "priority",
            "h",
            F.round("yhat", 4).alias("yhat"),
            F.round(
                F.greatest(F.lit(0.0), F.col("yhat") - 1.96 * F.col("bt_rmse")),
                4,
            ).alias("ci_lo"),
            F.round(F.col("yhat") + 1.96 * F.col("bt_rmse"), 4).alias("ci_hi"),
            F.lit("gbt_mllib").alias("model"),
        )
        # materialize the series-grain result (keys × HORIZON rows — the
        # same size class every forecast op returns and the driver
        # collects) so the cache can be released here; a production run
        # forecasting millions of series would write `result` to a sink
        # instead and unpersist after the write
        return result.collect(), result.schema  # bounded: keys × HORIZON
    finally:
        s.unpersist()


@REG.op("ml_gbt_mllib")  # rows-only: yhat comes from fitted JVM tree
# state no static SQL can reproduce (same standing as ml_sarimax /
# ml_catboost); the deterministic half is hash-certified by
# ml_gbt_contract below, shape/recursion by tests/test_mllib_forecast.py
def ml_gbt_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global MLlib GBT forecaster (see module docstring): the
    reference CatBoost slot's lag-features + recursive-predict shape
    (core/engine/models.py:206-303) trained as ONE distributed
    pyspark.ml GBTRegressor over every series' rows, the MLlib surface
    BASELINE.json names. Output schema matches the per-series forecast
    family (tsforecast._forecast_op)."""
    return _gbt_forecast_frame(spark, sf_dir)


@REG.op(
    "ml_gbt_contract",
    oracle=_SERIES_CTE
    + f"""
    , months AS (SELECT count(*) AS m FROM spine)
    SELECT k.status, k.priority,
           CAST({HORIZON} AS BIGINT) AS n_horizons,
           true AS h_complete,
           true AS yhat_nonneg,
           true AS band_const,
           true AS lo_clipped_sym,
           true AS band_ordered
    FROM keys k, months WHERE m >= {MIN_MONTHS}
    """,
)
def ml_gbt_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level gate for the DETERMINISTIC half of the MLlib
    forecaster (the ep3_forecast_contract pattern — model state stays
    rows-only, its contract becomes hash-certified booleans):

    * eligibility — exactly the (status, priority) keys of the
      zero-filled series grid produce output, iff the spine has
      >= {MIN_MONTHS} months (lag-12 must exist strictly inside the
      train span);
    * shape — exactly {HORIZON} horizon rows (h = 1..{HORIZON}) per
      series (the recursion emitted every step exactly once);
    * clip — yhat >= 0 everywhere (counts can't go negative);
    * CI arithmetic (reference pages/4:321-324) — the upper margin
      ci_hi − yhat = 1.96·rmse is CONSTANT across a series' horizons,
      ci_lo = max(0, 2·yhat − ci_hi), and ci_lo <= ci_hi everywhere.

    Tolerances are 1e-3 against 4-dp rounding. The oracle recomputes
    the eligible-key set from the same series CTE with every invariant
    folded to `true` — a wrong key set, missing horizon, negative
    prediction, or asymmetric band hash-mismatches at the driver."""
    out = ml_gbt_mllib(spark, sf_dir)
    hi_margin = F.col("ci_hi") - F.col("yhat")
    lo_expect = F.greatest(F.lit(0.0), F.lit(2.0) * F.col("yhat") - F.col("ci_hi"))
    per = out.groupBy("status", "priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_horizons"),
        F.array_sort(F.collect_list("h")).alias("hs"),
        F.min("yhat").alias("yhat_min"),
        (F.max(hi_margin) - F.min(hi_margin)).alias("margin_spread"),
        F.max(F.abs(F.col("ci_lo") - lo_expect)).alias("lo_err"),
        F.min((F.col("ci_lo") <= F.col("ci_hi")).cast("int")).alias("ord_min"),
    )
    return per.select(
        "status",
        "priority",
        "n_horizons",
        (F.col("hs") == F.array(*[F.lit(i) for i in range(1, HORIZON + 1)])).alias(
            "h_complete"
        ),
        (F.col("yhat_min") >= 0.0).alias("yhat_nonneg"),
        (F.col("margin_spread") < 1e-3).alias("band_const"),
        (F.col("lo_err") < 1e-3).alias("lo_clipped_sym"),
        (F.col("ord_min") == 1).alias("band_ordered"),
    )


# ----------------------------------------------------- ml_gbt_persist

@REG.op(
    "ml_gbt_persist",
    oracle=_SERIES_CTE
    + f"""
    , months AS (SELECT count(*) AS m FROM spine),
    nk AS (SELECT count(*) AS k FROM keys)
    SELECT CAST(20 AS INT) AS n_trees,
           CAST(nk.k * (months.m - {max(LAGS)}) AS BIGINT) AS n_rows_scored,
           true AS roundtrip_identical,
           true AS featimp_normalized
    FROM nk, months WHERE months.m >= {MIN_MONTHS}
    """,
)
def ml_gbt_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib-native model persistence under the hash gate — the
    reference persists its fitted models to disk and reloads them for
    later prediction (ml_persist covers the numpy family); this is the
    same lifecycle step for the distributed GBT, using pyspark.ml's
    own writer/loader (Parquet tree data + JSON metadata — the format
    a model registry stores). The op takes the SESSION'S fitted model
    (trained once by the forecast ops via _GBT_MODEL_MEMO — no second
    fit), writes it, loads it back, and hash-certifies:

    * n_trees — the loaded ensemble has exactly the configured 20
      stages (a truncated write loses trees silently);
    * n_rows_scored — both models score every complete-lag row
      (keys × (months − {max(LAGS)}), which the oracle recomputes from
      the shared series CTE);
    * roundtrip_identical — loaded-model predictions equal the
      original's EXACTLY on every scored row (tree traversal is
      discrete: any serialization drift in a threshold or leaf value
      shows up as a changed prediction, so exact equality is the
      right bar, not a tolerance);
    * featimp_normalized — feature importances still sum to 1 (the
      metadata half of the round trip).

    Scale: save/load is model-sized (KBs); the verification join is
    one keys×months-grain frame against itself."""
    import os
    import shutil

    from pyspark.ml.regression import GBTRegressionModel

    from claim_analysis_engine_spark.tmputil import fresh_dir

    from claim_analysis_engine_spark.tables import session_memo_key

    s = _lag_features(_series(spark, sf_dir))
    m = s.agg(F.max("idx")).first()[0]
    if m is None or m < MIN_MONTHS:
        return spark.createDataFrame(
            [],
            "n_trees int, n_rows_scored bigint, roundtrip_identical boolean, "
            "featimp_normalized boolean",
        )
    memo_key = session_memo_key(spark, sf_dir)
    if memo_key not in _GBT_MODEL_MEMO:
        _gbt_forecast_frame(spark, sf_dir)  # trains once, fills the memo
    assembler, model = _GBT_MODEL_MEMO[memo_key]

    path = os.path.join(
        fresh_dir("cae_gbt_persist_"), "model"
    )
    try:
        model.write().overwrite().save(path)
        loaded = GBTRegressionModel.load(path)

        feats = assembler.transform(s.dropna(subset=_FEATURES)).select(
            "status", "priority", "idx", "features"
        )
        a = model.transform(feats).select(
            "status", "priority", "idx", F.col("prediction").alias("p_orig")
        )
        b = loaded.transform(feats).select(
            "status", "priority", "idx", F.col("prediction").alias("p_load")
        )
        agree = (
            a.join(b, ["status", "priority", "idx"])
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows_scored"),
                F.max(F.abs(F.col("p_orig") - F.col("p_load"))).alias(
                    "max_diff"
                ),
            )
            .first()
        )
        imp_sum = float(sum(loaded.featureImportances.toArray()))
    finally:
        # remove on every path — a failed save/load/transform must not
        # orphan the temp model dir across repeated bench/gate runs
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(loaded.getNumTrees),
                agree["n_rows_scored"],
                float(agree["max_diff"]) == 0.0,
                abs(imp_sum - 1.0) < 1e-9,
            )
        ],
        "n_trees int, n_rows_scored bigint, roundtrip_identical boolean, "
        "featimp_normalized boolean",
    )


# -------------------------------------------------- ml_gbt_leaderboard

@REG.op(
    "ml_gbt_leaderboard",
    oracle=_SERIES_CTE
    + f"""
    , months AS (SELECT count(*) AS m FROM spine),
    idxed AS (
      SELECT status, priority, n,
             row_number() OVER (PARTITION BY status, priority
                                ORDER BY month) AS idx,
             lag(n, 12) OVER (PARTITION BY status, priority
                              ORDER BY month) AS l12
      FROM series
    ),
    test AS (
      SELECT i.* FROM idxed i, months WHERE i.idx > m - {HORIZON}
    ),
    per AS (
      SELECT status, priority,
             sqrt(avg((n - l12) * (n - l12))) AS rmse
      FROM test GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_series,
           round(CAST(sum(rmse) AS DOUBLE), 4) AS snaive_rmse_sum,
           true AS gbt_beats_snaive
    FROM per, months WHERE m >= {MIN_MONTHS}
    """,
)
def ml_gbt_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accuracy-floor claim itself, driver-hash-certified: the
    pooled MLlib GBT's recursive backtest RMSE (summed over series;
    recovered from the band — (ci_hi − yhat)/1.96 is constant per
    series by the CI contract) must BEAT seasonal naive
    (ŷ(m) = y(m−12)) scored on the IDENTICAL held-out months. The
    seasonal-naive side is fully SQL-expressible, so the oracle
    recomputes snaive_rmse_sum as an independent VALUE (both engines
    derive it from the shared series CTE — a drifted split, lag
    misalignment, or changed spine flips the number, not just a
    boolean) and asserts the comparison boolean. Measured margin:
    GBT 19.10 vs snaive 22.71 at sf0.001, 119.33 vs 133.97 at sf0.01
    (~13-16%) — a model regression that costs the pooled GBT its edge
    over the floor every claims dashboard could build for free
    hash-mismatches at the driver.

    Scale: both sides are keys-grain aggregates over the shared
    (keys × months) frame; the GBT side reuses the session-memoized
    forecast (no second training)."""
    s = _lag_features(_series(spark, sf_dir))
    m = s.agg(F.max("idx")).first()[0]
    if m is None or m < MIN_MONTHS:
        return spark.createDataFrame(
            [], "n_series bigint, snaive_rmse_sum double, gbt_beats_snaive boolean"
        )
    snaive = (
        s.where(F.col("idx") > m - HORIZON)
        .groupBy("status", "priority")
        .agg(F.sqrt(F.avg((F.col("n") - F.col("lag12")) ** 2)).alias("rmse"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_series"),
            F.round(F.sum("rmse").cast("double"), 4).alias("snaive_rmse_sum"),
            F.sum("rmse").alias("_sn_raw"),
        )
    )
    gbt = (
        ml_gbt_mllib(spark, sf_dir)
        .where(F.col("h") == 1)
        .select(((F.col("ci_hi") - F.col("yhat")) / 1.96).alias("r"))
        .agg(F.sum("r").alias("_gbt_raw"))
    )
    return snaive.crossJoin(F.broadcast(gbt)).select(
        "n_series",
        "snaive_rmse_sum",
        (F.col("_gbt_raw") < F.col("_sn_raw")).alias("gbt_beats_snaive"),
    )


# ---------------------------------------------------- ml_champion4

def _gbt_rmse_frame(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """Keys-sized per-series backtest RMSE of the pooled GBT, from the
    SAME training every other ml_gbt_* op shares (one fit per
    session/sf). None when the spine is too short to train
    (m < MIN_MONTHS) — the election then runs 3-way."""
    from claim_analysis_engine_spark.tables import session_memo_key

    key = session_memo_key(spark, sf_dir)
    if key not in _GBT_RMSE_MEMO:
        _gbt_forecast_frame(spark, sf_dir)  # trains once, fills the memo
    if key not in _GBT_RMSE_MEMO:
        return None
    rows, schema = _GBT_RMSE_MEMO[key]
    return spark.createDataFrame(rows, schema)


@REG.op("ml_champion4")  # rows-only: the ranked quantities are fitted-
# model RMSEs (learned state); election STRUCTURE is hash-certified by
# ml_champion4_contract below, determinism pinned in
# tests/test_mllib_forecast.py
def ml_champion4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The champion election with the pooled model on the ballot: the
    reference ranks per-series families by test RMSE on the temporal
    split (trainer.py:536-544); round 10 added a DISTRIBUTED pooled
    GBT beside the per-series numpy families but it never stood for
    election. This op re-runs the election over ml_champion's 3-family
    leaderboard PLUS the pooled GBT's per-series recursive-backtest
    RMSE — same held-out months (last {HORIZON}), same metric — so
    champion selection compares per-series vs pooled honestly. Ties
    break by model name (deterministic). One row per (series, model):
    rank + is_champion.

    Scale: the board is keys × 4 rows; the pooled entrant's RMSE rides
    the shared training memo (zero extra fits), and the finished board
    rows are memoized per (session, sf_dir) — the election and its
    contract pay the per-series tuning fanout once."""
    from claim_analysis_engine_spark.operators.tsforecast import ml_champion
    from claim_analysis_engine_spark.tables import session_memo_key

    memo_key = session_memo_key(spark, sf_dir)
    if memo_key in _CH4_MEMO:
        rows, schema = _CH4_MEMO[memo_key]
        return spark.createDataFrame(rows, schema)

    board = ml_champion(spark, sf_dir).select(
        "status", "priority", "model", "test_rmse"
    )
    g = _gbt_rmse_frame(spark, sf_dir)
    if g is not None:
        board = board.unionByName(
            g.select(
                "status",
                "priority",
                F.lit("gbt_mllib").alias("model"),
                F.round("bt_rmse", 4).alias("test_rmse"),
            )
        )
    w = W.partitionBy("status", "priority").orderBy(
        F.col("test_rmse").asc(), F.col("model").asc()
    )
    out = (
        board.withColumn("rank", F.row_number().over(w))
        .withColumn("is_champion", F.col("rank") == 1)
        .select("status", "priority", "model", "test_rmse", "rank", "is_champion")
    )
    rows, schema = out.collect(), out.schema  # keys × 4 — bounded
    if len(_CH4_MEMO) >= _GBT_MEMO_MAX:
        _CH4_MEMO.pop(next(iter(_CH4_MEMO)))
    _CH4_MEMO[memo_key] = (rows, schema)
    return spark.createDataFrame(rows, schema)


@REG.op(
    "ml_champion4_contract",
    oracle=_SERIES_CTE
    + f"""
    , months AS (SELECT count(*) AS m FROM spine)
    SELECT k.status, k.priority,
           CAST(4 AS BIGINT) AS n_models,
           true AS ranks_complete,
           true AS one_champion,
           true AS champion_minimal,
           true AS pooled_present
    FROM keys k, months WHERE m >= {MIN_MONTHS}
    """,
)
def ml_champion4_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4-way election's structure as driver-hash facts, per series
    (the ep3_forecast_contract pattern — RMSE values stay rows-only,
    the claims about them become certified booleans): every series on
    the zero-filled grid fields EXACTLY 4 candidates (3 per-series
    families + the pooled GBT), ranks are a complete 1..4 permutation,
    exactly one champion, the champion's RMSE is the per-series
    minimum (the election actually elects), and the pooled entrant is
    on every ballot. The oracle recomputes the eligible key set from
    the shared series CTE; a dropped series, a missing entrant, a
    duplicate rank, or a non-minimal champion each flips a VALUE."""
    b = ml_champion4(spark, sf_dir)
    return (
        b.groupBy("status", "priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_models"),
            (
                (F.min("rank") == 1)
                & (F.max("rank") == F.count(F.lit(1)))
                & (F.countDistinct("rank") == F.count(F.lit(1)))
            ).alias("ranks_complete"),
            (F.sum(F.col("is_champion").cast("int")) == 1).alias("one_champion"),
            (
                F.min("test_rmse")
                == F.min(F.when(F.col("rank") == 1, F.col("test_rmse")))
            ).alias("champion_minimal"),
            (
                F.max((F.col("model") == "gbt_mllib").cast("int")) == 1
            ).alias("pooled_present"),
        )
        .where(F.col("n_models") == 4)  # eligibility mirror: the pooled
        # entrant only exists when the spine trains (m >= MIN_MONTHS),
        # exactly the oracle's WHERE
        .select(
            "status",
            "priority",
            "n_models",
            "ranks_complete",
            "one_champion",
            "champion_minimal",
            "pooled_present",
        )
    )


# ------------------------------------- ep14: forecast by elected champion

# finished (keys × HORIZON) forecast rows per (session, sf_dir): the
# e2e op and its contract pay the per-series champion refit once
_EP14_MEMO: dict[tuple, tuple] = {}


def _ep14_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared engine for ep14_champion_forecast_e2e + contract: take
    the 4-way election's winner per series and emit THAT model's
    HORIZON-month forecast with ±1.96·RMSE bands.

    * numpy-family champions (hw / laglin / snaive) refit on the FULL
      series with their tuned params before forecasting — exactly the
      reference's champion lifecycle (trainer.py:548-570: refit on all
      data, then forecast), via one applyInPandas fanout that fits ONLY
      the elected family per series (cheaper than the election itself,
      which tunes every family).
    * gbt_mllib champions reuse the pooled model's session forecast:
      its recursion already runs from the FULL history (the train-span
      fit + full-history recursion is the pooled design — one model,
      honest backtest), so its production forecast IS the full-series
      forecast; a semi-join selects the elected keys.

    Scale: the election board is keys × 4 broadcast DATA; the numpy
    fanout is the embarrassingly-parallel per-series shape
    (fanout_apply's packing defeats AQE's bytes-only coalescing); the
    pooled side is a keys-sized semi-join against a memoized frame."""
    import numpy as np
    import pandas as pd

    from claim_analysis_engine_spark import forecast_models as fm
    from claim_analysis_engine_spark.operators.tsforecast import HORIZON as H
    from claim_analysis_engine_spark.tables import fanout_apply, session_memo_key

    memo_key = session_memo_key(spark, sf_dir)
    if memo_key in _EP14_MEMO:
        rows, schema = _EP14_MEMO[memo_key]
        return spark.createDataFrame(rows, schema)

    board = (
        ml_champion4(spark, sf_dir)
        .where(F.col("is_champion"))
        .select("status", "priority", "model")
    )
    gbt_fc = _gbt_forecast_frame(spark, sf_dir).join(
        board.where(F.col("model") == "gbt_mllib").drop("model"),
        ["status", "priority"],
        "left_semi",
    )
    np_board = board.where(F.col("model") != "gbt_mllib")
    s = _series(spark, sf_dir).join(
        F.broadcast(np_board), ["status", "priority"]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month")
        y = pdf["n"].to_numpy(dtype=float)
        name = pdf["model"].iloc[0]
        params, test_rmse = fm.tune_model(name, y)
        model = fm.slot_factory(name)(**params).fit(y)
        fc = model.predict(H)
        lo, hi = fm.confidence_interval(fc, test_rmse)
        return pd.DataFrame(
            {
                "status": pdf["status"].iloc[0],
                "priority": pdf["priority"].iloc[0],
                "h": np.arange(1, H + 1),
                "yhat": np.round(fc, 4),
                "ci_lo": np.round(lo, 4),
                "ci_hi": np.round(hi, 4),
                "model": name,
            }
        )

    np_fc = fanout_apply(
        s,
        ["status", "priority"],
        run,
        "status string, priority string, h int, yhat double, "
        "ci_lo double, ci_hi double, model string",
    )
    out = np_fc.unionByName(gbt_fc)
    rows, schema = out.collect(), out.schema  # keys × HORIZON — bounded
    if len(_EP14_MEMO) >= _GBT_MEMO_MAX:
        _EP14_MEMO.pop(next(iter(_EP14_MEMO)))
    _EP14_MEMO[memo_key] = (rows, schema)
    return spark.createDataFrame(rows, schema)


@REG.op("ep14_champion_forecast_e2e")  # rows-only: yhat comes from the
# elected fitted model (learned state); structure + election agreement
# are hash-certified by ep14_champion_forecast_contract below
def ep14_champion_forecast_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last seam in the forecasting story closed (r11 verdict #3):
    the 4-way election (ml_champion4) PICKS a winner per series, and
    this op EMITS that winner's forecast — champion refit on the full
    series, {HORIZON}-month horizon, ±1.96·RMSE bands clipped at 0 —
    the reference's champion lifecycle (trainer.py:548-570) composed
    with the distributed election. One row per (series, horizon) with
    the elected model's name on every row."""
    return _ep14_frame(spark, sf_dir)


@REG.op(
    "ep14_champion_forecast_contract",
    oracle=_SERIES_CTE
    + f"""
    , months AS (SELECT count(*) AS m FROM spine)
    SELECT k.status, k.priority,
           CAST({HORIZON} AS BIGINT) AS n_horizons,
           true AS h_complete,
           true AS model_matches_election,
           true AS band_const,
           true AS lo_clipped_sym,
           true AS band_ordered
    FROM keys k, months WHERE m >= {MIN_MONTHS}
    """,
)
def ep14_champion_forecast_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-certified contract for the champion-forecast lifecycle
    (the ep3_forecast_contract pattern — learned yhat stays rows-only,
    the claims about it become certified booleans): every series on
    the zero-filled grid emits EXACTLY {HORIZON} horizon rows (h a
    complete 1..{HORIZON}); every emitted row's model equals the
    election's is_champion row for that series (the seam this op
    exists to close — a forecast from a non-elected model flips the
    VALUE); and the CI arithmetic holds (reference pages/4:321-324):
    constant upper margin per series, ci_lo = max(0, 2*yhat - ci_hi),
    ci_lo <= ci_hi. Eligibility mirrors ml_champion4_contract: rows
    exist only when the spine trains the pooled entrant
    (m >= {MIN_MONTHS}), which the oracle recomputes from the shared
    series CTE. Tolerances are 1e-3 against the op's 4-dp rounding."""
    s = _lag_features(_series(spark, sf_dir))
    m = s.agg(F.max("idx")).first()[0]
    empty_schema = (
        "status string, priority string, n_horizons bigint, "
        "h_complete boolean, model_matches_election boolean, "
        "band_const boolean, lo_clipped_sym boolean, band_ordered boolean"
    )
    if m is None or m < MIN_MONTHS:  # the oracle's eligibility mirror
        return spark.createDataFrame([], empty_schema)
    out = _ep14_frame(spark, sf_dir)
    board = (
        ml_champion4(spark, sf_dir)
        .where(F.col("is_champion"))
        .select("status", "priority", F.col("model").alias("champ_model"))
    )
    hi_margin = F.col("ci_hi") - F.col("yhat")
    lo_expect = F.greatest(
        F.lit(0.0), F.lit(2.0) * F.col("yhat") - F.col("ci_hi")
    )
    per = (
        out.join(F.broadcast(board), ["status", "priority"], "left")
        .groupBy("status", "priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_horizons"),
            F.array_sort(F.collect_list("h")).alias("hs"),
            F.min(
                (F.col("model") == F.col("champ_model")).cast("int")
            ).alias("match_min"),
            (F.max(hi_margin) - F.min(hi_margin)).alias("margin_spread"),
            F.max(F.abs(F.col("ci_lo") - lo_expect)).alias("lo_err"),
            F.min((F.col("ci_lo") <= F.col("ci_hi")).cast("int")).alias(
                "ord_min"
            ),
        )
    )
    return per.select(
        "status",
        "priority",
        "n_horizons",
        (
            F.col("hs")
            == F.array(*[F.lit(i) for i in range(1, HORIZON + 1)])
        ).alias("h_complete"),
        (F.col("match_min") == 1).alias("model_matches_election"),
        (F.col("margin_spread") < 1e-3).alias("band_const"),
        (F.col("lo_err") < 1e-3).alias("lo_clipped_sym"),
        (F.col("ord_min") == 1).alias("band_ordered"),
    )
