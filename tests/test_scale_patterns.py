"""Plan-level assertions for the scale-pattern operators: results are
oracle-checked elsewhere; HERE we assert the physical plans actually
have the promised shape (no shuffle before a bucketed join, partition
filters on the pruned scan)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from claim_analysis_engine_spark.operators.scale_patterns import (
    join_bucketed,
    prune_partition,
)
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_join_side_shuffle(spark):
    # force a sort-merge join: at tiny SF the small side would broadcast
    # and the bucket layout would never be consulted
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(join_bucketed(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_part = plan.split("HashAggregate")[0]
    # the join consumes bucketed scans directly: any Exchange in the
    # pre-aggregate section would mean the bucket layout was ignored
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part
    assert "Bucketed: true" in plan


def test_partition_pruned_scan_carries_partition_filters(spark):
    plan = _plan(prune_partition(spark, SF_SMALL))
    assert "PartitionFilters" in plan
    # both predicates must appear as partition (directory) filters
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "y" in pf_line and "m" in pf_line
    assert "1997" in pf_line and "6" in pf_line


def test_split_hash_plan_has_single_aggregate_exchange(spark):
    """corpus_split_hash is a per-row projection + one group aggregate:
    exactly one Exchange (the groupBy), nothing else — membership
    hashing must not introduce a join or extra shuffle."""
    from claim_analysis_engine_spark.operators.pipeline_ops import corpus_split_hash

    plan = _plan(corpus_split_hash(spark, SF_SMALL))
    assert plan.count("Exchange") <= 2  # agg exchange (+AQE read) only
    assert "Join" not in plan


def test_contamination_plan_broadcasts_benchmark(spark):
    """The benchmark shingle set must BROADCAST into the corpus join —
    a shuffled (sort-merge) join here would move the full exploded
    corpus shingle stream for a tiny build side."""
    from claim_analysis_engine_spark.operators.pipeline_ops import (
        corpus_contamination,
    )

    plan = _plan(corpus_contamination(spark, SF_SMALL))
    assert "BroadcastExchange" in plan
    assert "BroadcastHashJoin" in plan


def test_pairs_threshold_plan_broadcasts_anchor_set(spark):
    """sim_pairs_threshold must be a broadcast nested-loop of the tiny
    anchor sample against one corpus pass — never a corpus×corpus
    cartesian product."""
    from claim_analysis_engine_spark.operators.similarity import (
        sim_pairs_threshold,
    )

    plan = _plan(sim_pairs_threshold(spark, SF_SMALL))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_approx_distinct_error_bounded(spark):
    from claim_analysis_engine_spark.operators.scale_patterns import (
        agg_approx_distinct,
    )

    for r in agg_approx_distinct(spark, SF_SMALL).collect():
        rel = abs(r.approx_custs - r.exact_custs) / max(1, r.exact_custs)
        assert rel < 0.05, f"{r.o_orderstatus}: rel error {rel:.3f}"


def test_sketch_quantiles_error_bounded(spark):
    from claim_analysis_engine_spark.operators.scale_patterns import (
        agg_sketch_quantiles,
    )

    for r in agg_sketch_quantiles(spark, SF_SMALL).collect():
        for a, e in ((r.approx_p50, r.exact_p50), (r.approx_p99, r.exact_p99)):
            assert abs(a - e) / max(1.0, abs(e)) < 0.02, (r.o_orderstatus, a, e)


def test_sorted_shards_are_disjoint_increasing_and_range_partitioned(spark):
    from claim_analysis_engine_spark.operators.scale_patterns import (
        sort_global_shards,
        sorted_export_frame,
    )

    # the WRITE plan carries the range exchange; the op's returned
    # profile reads the files back after it has executed
    write_plan = _plan(sorted_export_frame(spark, SF_SMALL))
    assert "rangepartitioning" in write_plan.lower(), write_plan
    df = sort_global_shards(spark, SF_SMALL)
    rows = sorted(
        (r.shard, r.min_key, r.max_key) for r in df.collect()
    )
    assert len(rows) > 1
    for (s0, _lo0, hi0), (s1, lo1, _hi1) in zip(rows, rows[1:]):
        assert s1 == s0 + 1  # every shard present, in order
        assert lo1 > hi0  # ranges disjoint AND increasing — total order


def test_salted_join_runs_on_salted_keys_without_broadcast(spark):
    from claim_analysis_engine_spark.operators.scale_patterns import (
        join_skew_salted,
    )

    plan = _plan(join_skew_salted(spark, SF_SMALL))
    # the demonstrated join must actually run salted and shuffled:
    # a broadcast would bypass the very skew the salt addresses
    assert "ShuffledHashJoin" in plan, plan
    # formatted explain puts the keys in the detail block
    key_lines = [l for l in plan.splitlines() if "keys" in l and "salt" in l]
    assert key_lines, plan


def test_zorder_shards_bound_both_dimensions(spark):
    """With 16 z-shards (= top 4 Morton bits = 2 leading bits of each
    dimension pinned), every shard must span at most a quarter of BOTH
    dimension ranges — the property that makes either-predicate file
    skipping work. A single-dimension sort bounds one dim and spans
    the other; the final assert shows the contrast isn't vacuous."""
    from claim_analysis_engine_spark.operators.scale_patterns import sort_zorder

    rows = sort_zorder(spark, SF_SMALL).collect()
    assert len(rows) > 4
    for r in rows:
        assert r.max_bx - r.min_bx <= 63, r
        assert r.max_by - r.min_by <= 63, r
    # the data itself spans (much) more than one shard's window in bx,
    # so the per-shard bound is a real clustering effect
    assert max(r.max_bx for r in rows) - min(r.min_bx for r in rows) > 63


def test_compaction_reduces_files_and_reports_truthfully(spark):
    import glob

    from claim_analysis_engine_spark.operators.scale_patterns import (
        _LAST_COMPACTION_DIRS,
        COMPACT_ROWS_PER_FILE,
        FRAGMENT_FILES,
        snk_compaction,
    )

    row = snk_compaction(spark, SF_SMALL).collect()[0]
    assert row.n_files_before == FRAGMENT_FILES
    assert row.n_files_after == -(-row.n_rows // COMPACT_ROWS_PER_FILE)
    assert row.n_files_after < row.n_files_before
    # the engine-side counts (distinct input_file_name) must agree with
    # the filesystem — the report is not self-referential bookkeeping
    frag, compacted = _LAST_COMPACTION_DIRS
    assert len(glob.glob(f"{frag}/*.parquet")) == row.n_files_before
    assert len(glob.glob(f"{compacted}/*.parquet")) == row.n_files_after


def test_dpp_injects_runtime_filter_into_fact_scan(spark):
    """The fact scan's partition filters must carry a
    dynamicpruningexpression — proof the dim's runtime keys reached the
    directory listing, not just the join."""
    from claim_analysis_engine_spark.operators.scale_patterns import join_dpp

    plan = _plan(join_dpp(spark, SF_SMALL))
    assert "dynamicpruning" in plan.lower(), plan


def test_hll_union_rollup_merges_within_error(spark):
    """The union-of-fine-sketches estimate must track both the direct
    one-pass sketch and the exact count within HLL's error envelope —
    the mergeability contract that lets a sketch table answer every
    coarser rollup without re-scanning facts."""
    from claim_analysis_engine_spark.operators.scale_patterns import (
        agg_hll_union_rollup,
    )

    for r in agg_hll_union_rollup(spark, SF_SMALL).collect():
        assert abs(r.union_est - r.exact) / max(1, r.exact) < 0.05, r
        assert abs(r.union_est - r.direct_est) / max(1, r.direct_est) < 0.05, r


def test_scd2_intervals_on_planted_change_sequence(spark):
    """dim_scd2's oracle proves engine agreement on real data; this
    plants a known change sequence and checks the SCD2 semantics
    themselves: consecutive repeats compress into one version,
    same-second duplicates resolve to the max event_id, intervals
    chain gaplessly, and only the last version per user is current."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.joins_temporal import (
        SCD2_OPEN_END,
        dim_scd2,
    )

    rows = [
        # user 1: A at t=10, repeat A at t=20 (compressed), B at t=30,
        # same-second conflict at t=30 (event 5 beats event 4), A at t=50
        (1, 10, 1, "A"),
        (2, 20, 1, "A"),
        (4, 30, 1, "Z"),
        (5, 30, 1, "B"),
        (6, 50, 1, "A"),
        # user 2: single version
        (7, 15, 2, "C"),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory(prefix="cae_scd2_") as d:
        (
            spark.createDataFrame(
                rows, "event_id long, ts_l long, user_id long, event_type string"
            )
            .select(
                "event_id",
                F.timestamp_seconds("ts_l").alias("ts"),
                "user_id",
                "event_type",
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            .write.parquet(os.path.join(d, "events.parquet"))
        )
        got = {
            (r.user_id, r.version): (r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in dim_scd2(spark, d).collect()
        }
    assert got == {
        (1, 1): ("A", 10, 30, False),  # repeat at t=20 compressed away
        (1, 2): ("B", 30, 50, False),  # event 5 wins the t=30 tie
        (1, 3): ("A", 50, SCD2_OPEN_END, True),
        (2, 1): ("C", 15, SCD2_OPEN_END, True),
    }


def test_scd2_plan_has_exactly_one_shuffle(spark):
    """All three dim_scd2 windows must share the user_id partitioning;
    a (user, second)-partitioned dedupe window would silently add a
    second exchange."""
    from claim_analysis_engine_spark.operators.joins_temporal import dim_scd2

    plan = _plan(dim_scd2(spark, SF_SMALL))
    detail_exchanges = [
        line for line in plan.splitlines()
        if line.strip().startswith("(") and "Exchange" in line
        and "Reused" not in line
    ]
    assert len(detail_exchanges) == 1, detail_exchanges


def test_pit_scd2_credits_boundary_purchase_to_the_new_version(spark):
    """The inclusive lower bound is the PIT join's sharp edge: a
    purchase in the same second a new version opens must credit the
    NEW version (valid_from <= ts), and purchases never credit a
    later version (ts < valid_to)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.joins_temporal import (
        join_pit_scd2,
    )

    rows = [
        # user 1 versions: A @10, purchase @30 OPENS version 2
        # (purchase itself is the attribute change), so the t=30
        # purchase credits version 2, not version 1
        (1, 10, 1, "A", 0.0),
        (2, 30, 1, "purchase", 5.0),
        # back to A @40, then a purchase @60 credits version 3? no —
        # the @60 purchase opens version 4 ("purchase" again after A)
        (3, 40, 1, "A", 0.0),
        (4, 60, 1, "purchase", 7.5),
    ]
    with tempfile.TemporaryDirectory(prefix="cae_pit_") as d:
        (
            spark.createDataFrame(
                rows,
                "event_id long, ts_l long, user_id long, "
                "event_type string, value double",
            )
            .select(
                "event_id",
                F.timestamp_seconds("ts_l").alias("ts"),
                "user_id",
                "event_type",
                "value",
                F.lit("{}").alias("props"),
            )
            .write.parquet(os.path.join(d, "events.parquet"))
        )
        got = {
            (r.user_id, r.version): (r.attr, r.n_purchases, r.total_value)
            for r in join_pit_scd2(spark, d).collect()
        }
    assert got == {
        (1, 2): ("purchase", 1, 5.0),
        (1, 4): ("purchase", 1, 7.5),
    }


def test_bm25_topk_avoids_global_sort(spark):
    """The ranked-retrieval top-k must compile to TakeOrderedAndProject
    (per-partition heaps merged on the driver), never a global
    single-partition Sort — the difference between a safe and an
    unrunnable ranking step at corpus scale."""
    from claim_analysis_engine_spark.operators.textops import txt_search_bm25

    plan = _plan(txt_search_bm25(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan


def test_bloom_prefilter_runs_before_fact_exchange(spark):
    """join_bloom_prefilter's whole point: the bloom probe must sit in
    the fact SCAN stage (before any Exchange), and the final join must
    NOT be a broadcast (the scenario is a dim too big to ship)."""
    from claim_analysis_engine_spark.operators.scale_patterns import (
        join_bloom_prefilter,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(join_bloom_prefilter(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the pythonUDF bloom probe evaluates in the scan-side stage: its
    # NODE ID must be lower than every Exchange's (formatted plans
    # number nodes bottom-up, so upstream = smaller id; comparing text
    # positions instead would read the top-down tree rendering)
    import re

    probe_ids = [int(m) for m in re.findall(r"ArrowEvalPython \((\d+)\)", plan)]
    exchange_ids = [int(m) for m in re.findall(r"Exchange \((\d+)\)", plan)]
    assert probe_ids and exchange_ids, plan[:800]
    assert min(probe_ids) < min(exchange_ids), (probe_ids, exchange_ids)


def test_bloom_prefilter_has_no_false_negatives(spark):
    """Every true match must survive the probe: compare the
    prefiltered fact keyset against the exact semi join."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.scale_patterns import (
        join_bloom_prefilter,
    )
    from claim_analysis_engine_spark.tables import load

    out = join_bloom_prefilter(spark, SF_SMALL)
    dim = (
        load(spark, SF_SMALL, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_nationkey")
    )
    exact = (
        load(spark, SF_SMALL, "orders")
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    got = {r["c_nationkey"]: r["n_orders"] for r in out.collect()}
    want = {r["c_nationkey"]: r["n_orders"] for r in exact.collect()}
    assert got == want


def test_heavy_hitters_candidate_pass_is_exact(spark):
    """The pigeonhole candidate pass must lose NO key above the global
    threshold: compare against the direct groupBy-HAVING."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.scale_patterns import (
        HH_FRACTION,
        agg_heavy_hitters,
    )
    from claim_analysis_engine_spark.tables import load

    got = {
        r["user_id"]: r["n_events"]
        for r in agg_heavy_hitters(spark, SF_SMALL).collect()
    }
    e = load(spark, SF_SMALL, "events")
    n = e.count()
    want = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > HH_FRACTION * n)
        .collect()
    }
    assert got == want and len(want) > 0


def test_star_flatten_has_no_fact_shuffle_before_aggregate(spark):
    """join_star_flatten: three broadcast joins, then ONE aggregate
    exchange — the fact table must never shuffle pre-aggregate."""
    from claim_analysis_engine_spark.operators.relational import join_star_flatten

    import re

    plan = _plan(join_star_flatten(spark, SF_SMALL))
    # formatted output names each node in the tree AND a detail header;
    # count distinct node ids, not substring occurrences
    join_ids = set(re.findall(r"\((\d+)\) BroadcastHashJoin", plan))
    assert len(join_ids) == 3, plan[:600]
    # the only hash-partitioning exchange is the aggregate's: the fact
    # side must reach the rollup through broadcasts alone
    # "(N) Exchange" detail headers are the shuffle exchanges only
    # (broadcasts render as "(N) BroadcastExchange", a different word)
    ex_count = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
    assert ex_count == 1, (ex_count, plan[:600])


def test_cms_estimate_dominates_exact_for_every_key(spark):
    """The one-sided CountMin guarantee holds for ALL keys, not just
    the contract's top-20: min-over-rows of bucket sums always
    includes the key's own count as a summand."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.scale_patterns import (
        CMS_D,
        CMS_W,
    )
    from claim_analysis_engine_spark.tables import load
    from tests.conftest import SF_ORACLE

    ev = load(spark, SF_ORACLE, "events").select("user_id")
    depth = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i")
    bucket = F.pmod(F.xxhash64("user_id", F.col("i")), F.lit(CMS_W)).alias(
        "bucket"
    )
    table = (
        ev.select("user_id", depth)
        .select("i", bucket)
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = (
        exact.select("user_id", "exact_cnt", depth)
        .select("user_id", "exact_cnt", "i", bucket)
        .join(F.broadcast(table), ["i", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("est"))
    )
    bad = est.where(F.col("est") < F.col("exact_cnt")).count()
    assert bad == 0


def test_cms_tables_merge_by_union_resum(spark):
    """Mergeability is the groupBy's associativity: the sketch of the
    full stream equals the re-summed union of two half-stream
    sketches, bucket for bucket."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.scale_patterns import (
        CMS_D,
        CMS_W,
    )
    from claim_analysis_engine_spark.tables import load
    from tests.conftest import SF_ORACLE

    ev = load(spark, SF_ORACLE, "events").select("user_id", "event_id")

    def sketch(df):
        depth = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias(
            "i"
        )
        return (
            df.select("user_id", depth)
            .select(
                "i",
                F.pmod(F.xxhash64("user_id", F.col("i")), F.lit(CMS_W)).alias(
                    "bucket"
                ),
            )
            .groupBy("i", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    full = sketch(ev)
    merged = (
        sketch(ev.where(F.col("event_id") % 2 == 0))
        .unionByName(sketch(ev.where(F.col("event_id") % 2 == 1)))
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = (
        full.join(merged, ["i", "bucket"], "full")
        .where(
            F.coalesce(full["cnt"], F.lit(0))
            != F.coalesce(merged["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_cms_measured_excess_stays_under_certified_slack_for_all_keys(spark):
    """Anchor the hard-coded-TRUE slack boolean to a MEASURED quantity
    (the r11 ADVICE ask): the worst per-key excess of the min-over-rows
    estimate over the exact count, across ALL keys — a population
    hundreds of times larger than the contract's top-20 — stays under
    the certified ceil(3N/W) bound on both committed scale factors
    (measured: 0 vs bound 15 at sf0.01; 82 vs 147 at sf0.1, i.e.
    worst-of-ALL-keys ~1.7x N/W where the bound allows 3x). The
    20 certified keys are a uniform draw from this population hash-wise,
    so a new sf or hash change would have to push the corpus-wide worst
    past a bound currently clearing it by ~1.8x before the oracle's
    hard-coded TRUE could trip — and the erosion shows up HERE first."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.scale_patterns import (
        CMS_W,
        _cms_depth_col,
        _cms_bucket_col,
        _cms_table,
    )
    from claim_analysis_engine_spark.tables import load

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        ev = load(spark, sf, "events").select("user_id")
        table = _cms_table(ev)
        exact = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("exact_cnt")
        )
        est = (
            exact.select("user_id", "exact_cnt", _cms_depth_col())
            .select("user_id", "exact_cnt", "i", _cms_bucket_col())
            .join(F.broadcast(table), ["i", "bucket"])
            .groupBy("user_id", "exact_cnt")
            .agg(F.min("cnt").alias("est"))
        )
        row = est.agg(
            F.max(F.col("est") - F.col("exact_cnt")).alias("worst_excess")
        ).crossJoin(
            F.broadcast(ev.agg(F.count(F.lit(1)).alias("n")))
        ).first()
        bound = (3 * row["n"] + CMS_W - 1) // CMS_W
        assert row["worst_excess"] <= bound, (
            f"{sf}: worst excess {row['worst_excess']} exceeds the "
            f"certified ceil(3N/W) bound ({bound}) even corpus-wide — "
            "the hard-coded slack TRUE is no longer safe"
        )


def test_cms_table_size_is_stream_length_independent(spark):
    """The sketch's defining scale property as a golden: a 10x larger
    event stream (sf0.01 -> sf0.1) may not grow the sketch table past
    its D*W bound — the state-bound claim the streaming gate relies on."""
    from claim_analysis_engine_spark.operators.scale_patterns import (
        CMS_D,
        CMS_W,
        _cms_table,
    )
    from claim_analysis_engine_spark.tables import load

    sizes = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sizes[sf] = _cms_table(
            load(spark, sf, "events").select("user_id")
        ).count()
    assert all(n <= CMS_D * CMS_W for n in sizes.values())
    # the bigger stream touches at most the same bucket space
    assert sizes["/root/testdata/sf0.1"] <= CMS_D * CMS_W
