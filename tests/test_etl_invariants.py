"""Canonical-layer invariants (SURVEY §5 rebuild plan): 54-col arity,
alias mapping, keep-last dedup determinism, lag validity implication —
the reference's inline assertions (core/config.py:112) and phase-report
rules (Lag flagged never dropped) as pytest."""

from __future__ import annotations

from pyspark.sql import functions as F

from claim_analysis_engine_spark import etl
from claim_analysis_engine_spark.config import (
    CANONICAL_COLS,
    CANONICAL_SCHEMA,
    KOREAN_TO_ASCII,
)
from claim_analysis_engine_spark.operators.relational import etl_preprocess, proj_canon54
from tests.conftest import SF_SMALL


def test_schema_arity_and_uniqueness():
    assert len(CANONICAL_COLS) == 54
    assert len(set(CANONICAL_COLS)) == 54
    assert len(CANONICAL_SCHEMA.fields) == 54
    assert len(KOREAN_TO_ASCII) == 54


def test_canonicalize_is_exactly_54_cols(spark):
    out = proj_canon54(spark, SF_SMALL)
    assert out.columns == CANONICAL_COLS
    # 1 row in = 1 row out (reference core/etl.py:54-63 rule)
    n_in = spark.read.parquet(f"{SF_SMALL}/orders.parquet").count()
    assert out.count() == n_in


def test_canonicalize_maps_aliases_and_drops_extras(spark):
    raw = spark.createDataFrame(
        [("C1", "PLANT_A", "garbage")], ["상담번호", "플랜트", "not_a_field"]
    )
    out = etl.canonicalize(raw)
    row = out.collect()[0]
    assert row["claim_id"] == "C1"
    assert row["plant"] == "PLANT_A"
    assert "not_a_field" not in out.columns
    assert row["grade"] is None  # missing → typed null


def test_keep_last_dedup_uses_load_seq(spark):
    raw = spark.createDataFrame(
        [
            ("C1", "old", 0),
            ("C1", "new", 1),
            ("C2", "only", 0),
        ],
        ["상담번호", "플랜트", "load_seq"],
    )
    out = etl.preprocess(etl.canonicalize(raw, keep=("load_seq",)), load_seq="load_seq")
    got = {r["claim_id"]: r["plant"] for r in out.collect()}
    assert got == {"C1": "new", "C2": "only"}


def test_lag_valid_implies_nonnegative_lag(spark):
    out = etl_preprocess(spark, SF_SMALL)
    bad = out.where(F.col("lag_valid") & (F.col("lag_days") < 0)).count()
    assert bad == 0
    # invalid rows are flagged, never dropped: unparseable manufacture
    # dates (orderkey % 4 == 3) must still be present with lag_valid=False
    flagged = out.where(~F.col("lag_valid")).count()
    assert flagged > 0


def test_every_registered_op_is_documented_in_survey():
    """SURVEY.md §2 is the coverage contract the registry implements:
    every registered op id must appear there by name (in its own row
    or named inside a family row), so the inventory and the code can't
    silently drift apart."""
    from pathlib import Path

    from claim_analysis_engine_spark.registry import registry

    survey = Path(__file__).resolve().parent.parent.joinpath("SURVEY.md").read_text()
    missing = [op_id for op_id in registry() if op_id not in survey]
    assert not missing, f"ops registered but absent from SURVEY.md: {missing}"


def test_readme_verification_counts_match_the_registry():
    """README's verification-model paragraph states concrete operator
    counts; they have drifted silently before (187/18 while the
    registry held 188/19) — derive them from the registry instead of
    trusting the prose."""
    import re
    from pathlib import Path

    from claim_analysis_engine_spark.registry import registry

    reg = registry()
    n_ops = len(reg)
    n_oracle = sum(1 for op in reg.values() if op.oracle is not None)
    readme = Path(__file__).resolve().parent.parent.joinpath("README.md").read_text()
    m = re.search(
        r"\((\d+) operators, (\d+) oracle-checked, (\d+) rows-only", readme
    )
    assert m, "README verification-model counts sentence not found"
    assert tuple(map(int, m.groups())) == (n_ops, n_oracle, n_ops - n_oracle)


def test_sampling_front_is_duplicate_free_and_leads_the_registry():
    """The driver certifies the first ~50 registry entries. registry()
    already raises on ids missing from the merged map, but a DUPLICATE
    inside the front tuple would dedupe silently in the dict build and
    shrink the window by one slot — pin both properties."""
    from claim_analysis_engine_spark.registry import CURRENT_FRONT, registry

    assert len(CURRENT_FRONT) == 50, "driver samples EXACTLY 50 entries"
    assert len(set(CURRENT_FRONT)) == len(CURRENT_FRONT), "duplicate id in front"
    assert list(registry())[: len(CURRENT_FRONT)] == list(CURRENT_FRONT)


def test_sampling_front_equals_the_derived_plan():
    """The front is GENERATED, not transcribed bookkeeping (r12 verdict
    ask #6): scripts/plan_front.py derives the window from the
    CORRECTNESS_r* union — never-sampled additions guaranteed a slot,
    remaining slots recycle oldest-certification-first, oracle-bearing
    before rows-only within a cohort. This pins CURRENT_FRONT to that
    derivation, so adding an op without re-running the generator (or
    hand-editing the tuple into a stale order) fails loudly."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from plan_front import generate_front, latest_certs

    from claim_analysis_engine_spark.registry import CURRENT_FRONT, merged_registry

    ops = merged_registry()
    # a front is derived BEFORE its own round's correctness artifact
    # exists; once the driver writes it (end of round / judge's tree),
    # the full-union derivation describes the NEXT round's window — so
    # the current front must equal the plan from the full union (fresh
    # rotation) OR from the union minus its newest artifact (the
    # rotation this round shipped)
    plan_next = generate_front(ops, latest_certs())
    plan_shipped = generate_front(ops, latest_certs(exclude_max_round=True))
    assert list(CURRENT_FRONT) in (plan_next, plan_shipped), (
        "CURRENT_FRONT drifted from the derived plan — re-run "
        "scripts/plan_front.py and transcribe its output"
    )


def test_memoized_bench_extras_appear_in_the_cold_map():
    """r13 verdict ask #7, widened in r15 (r14 verdict ask #3): an
    EXTRA op whose query path rides a session memo (result-row replay,
    parquet-path memo, or a memoized model/fixture build) OR calls
    `.cache()`/`.persist()` on a frame must carry a reasoned MEMOIZED
    entry — else the official bench publishes replay-only numbers for
    it with no cold cost on record. The cache clause exists because
    Spark's CacheManager matches cached relations by CANONICALIZED
    PLAN: a deterministic frame cached inside query() is rebuilt as
    the same plan on the next in-session invocation and replays run
    1's materialized blocks exactly like a dict-memo. localCheckpoint
    is exempt (no CacheManager registration — the blocks die with the
    DataFrame). Detection is a static reachability fixpoint: a
    function is memo-touching if its source references
    rows_replay_memo, a *_MEMO dict, `.cache()` or `.persist(`, or
    (transitively) calls a memo-touching function anywhere in the
    package."""
    import ast
    import pathlib
    import re

    import bench
    import claim_analysis_engine_spark as pkg
    from claim_analysis_engine_spark.registry import registry

    pkg_dir = pathlib.Path(pkg.__file__).parent
    token = re.compile(
        r"rows_replay_memo|_[A-Z][A-Z0-9_]*_MEMO\b|\.cache\(\)|\.persist\("
    )
    marked: set[str] = set()
    calls: dict[str, set[str]] = {}
    for p in pkg_dir.rglob("*.py"):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                src = ast.unparse(node)
                callees = {
                    c.func.id
                    for c in ast.walk(node)
                    if isinstance(c, ast.Call) and isinstance(c.func, ast.Name)
                }
                calls.setdefault(node.name, set()).update(callees)
                if token.search(src):
                    marked.add(node.name)
    changed = True
    while changed:
        changed = False
        for name, callees in calls.items():
            if name not in marked and callees & marked:
                marked.add(name)
                changed = True

    reg = registry()
    uncovered = [
        op_id
        for op_id in bench.EXTRA
        if reg[op_id].query.__name__ in marked and op_id not in bench.MEMOIZED
    ]
    assert not uncovered, (
        f"EXTRA ops with memo-riding query paths missing from the bench "
        f"cold map (add a reasoned MEMOIZED entry): {uncovered}"
    )
    # and the map itself stays honest: every entry is a timed op with a
    # non-empty reason (membership beyond the static scan is fine —
    # some cold costs are Spark-side caches or staged layouts the
    # Python token scan can't see, e.g. rs_wrapper's series CTE)
    for op_id, why in bench.MEMOIZED.items():
        assert op_id in bench.EXTRA, f"{op_id!r} memoized but not timed"
        assert why.strip(), f"{op_id!r} has an empty cold-map reason"


def test_bench_exclusion_ledger_is_consistent_with_the_registry():
    """The BENCH_DETAIL `excluded` map (r11 verdict ask) must stay
    honest: every excluded id is a real registered op, no excluded op
    is simultaneously timed, and every id carries a non-empty reason."""
    import bench
    from claim_analysis_engine_spark.registry import registry

    reg = registry()
    timed = set(bench.HEADLINE) | set(bench.EXTRA)
    for op_id, reason in bench.EXCLUDED.items():
        assert op_id in reg, f"excluded id {op_id!r} is not a registered op"
        assert op_id not in timed, f"{op_id!r} is both excluded and timed"
        assert reason.strip(), f"{op_id!r} has no exclusion reason"


def test_bench_stderr_frame_counter_detects_jvm_traces(tmp_path):
    """The official-run stderr tee's frame counter (r13: the tail-
    hygiene guard) must count JVM/py4j stack frames and ignore plain
    log lines, and must return None when no tee ran."""
    import bench

    log = tmp_path / "bench_stderr.log"
    log.write_text(
        "26/08/16 INFO SparkContext: Running Spark\n"
        "java.io.FileNotFoundException: File /x/shard-*.jsonl does not exist\n"
        "\tat org.apache.hadoop.fs.RawLocalFileSystem.x(R.java:980)\n"
        "\tat py4j.Gateway.invoke(Gateway.java:282)\n"
        "\tat java.base/java.lang.Thread.run(Thread.java:840)\n"
        "[Stage 3:> (0 + 8) / 32]\n"
    )
    assert bench._stderr_stack_frames(str(log)) == 2
    assert bench._stderr_stack_frames(None) is None
    assert bench._stderr_stack_frames(str(tmp_path / "missing")) is None


def test_dq_expectations_fire_on_planted_violations(spark):
    """The all-pass oracle result on clean testdata proves agreement,
    not sensitivity — here every violation class is planted once and
    each named rule must fire with the exact count."""
    import datetime

    from claim_analysis_engine_spark.operators.aggregates import dq_check

    d = datetime.date
    rows = [
        # (orderkey, totalprice, orderdate, status)
        (1, 10.0, d(1998, 3, 1), "F"),      # clean
        (None, 10.0, d(1998, 3, 1), "F"),   # key_not_null
        (2, 10.0, d(1998, 3, 1), "F"),
        (2, 10.0, d(1998, 3, 1), "O"),      # key_unique (dup of 2)
        (3, -5.0, d(1998, 3, 1), "F"),      # price_positive
        (4, 10.0, d(1998, 3, 1), "X"),      # status_in_domain
        (5, 10.0, d(1931, 1, 1), "F"),      # date_in_bounds
    ]
    dirty = spark.createDataFrame(
        rows,
        "o_orderkey long, o_totalprice double, o_orderdate date, "
        "o_orderstatus string",
    )
    got = {r.rule: (r.n_violations, r.pass_) if hasattr(r, "pass_")
           else (r.n_violations, r["pass"]) for r in dq_check(dirty).collect()}
    assert got["key_not_null"] == (1, False)
    assert got["key_unique"] == (1, False)
    assert got["price_positive"] == (1, False)
    assert got["status_in_domain"] == (1, False)
    assert got["date_in_bounds"] == (1, False)
    assert got["month_in_range"] == (0, True)


def test_fk_orphan_check_fires_on_planted_orphans(spark):
    """The all-pass result on clean testdata proves agreement, not
    sensitivity: plant known orphans in a child frame and the check
    must count them exactly (nulls count as orphans too — a null FK
    has no parent row)."""
    from claim_analysis_engine_spark.operators.aggregates import fk_orphans

    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (8,), (None,)], "ck long"
    )
    row = fk_orphans(child, "ck", parent, "pk", "child.ck->parent").collect()[0]
    assert (row.fk, row.n_child, row.n_orphans, row["pass"]) == (
        "child.ck->parent",
        6,
        3,
        False,
    )


def test_psi_drift_fires_on_planted_shift(spark):
    """Near-zero PSI on stationary testdata proves agreement, not
    sensitivity: plant a current window whose prices shifted far right
    of the reference distribution and the summed PSI must cross the
    0.2 actionable-drift threshold (and land in the clamped top bin)."""
    import datetime
    import os
    import tempfile

    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.aggregates import (
        PSI_CUR_YEAR,
        PSI_REF_YEAR,
        dq_psi_drift,
    )

    rows = []
    for i in range(200):
        # reference: uniform over [100, 300)
        rows.append((datetime.date(PSI_REF_YEAR, 1 + i % 12, 1), 100.0 + i))
        # current: shifted well past the reference max
        rows.append((datetime.date(PSI_CUR_YEAR, 1 + i % 12, 1), 900.0 + i))
    with tempfile.TemporaryDirectory(prefix="cae_psi_") as d:
        spark.createDataFrame(
            rows, "o_orderdate date, o_totalprice double"
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = dq_psi_drift(spark, d).collect()
    total = sum(r.psi_term for r in out)
    assert total > 0.2, total
    top = next(r for r in out if r.bin == 9)
    assert top.n_cur == 200  # the whole shifted window clamps to bin 9
    assert sum(r.n_ref for r in out) == 200
