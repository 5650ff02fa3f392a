"""Golden tests for the pure risk-scoring decision tree
(claim_analysis_engine_spark.risk_engine), hand-computed the way the
reference's verification scripts assert expectations
(reference scripts/run_phase1_verification.py:79-86).

Each case pins one branch of the tree: no-occurrence, cold start
(including the critical fall-through quirk), sparse breakout + noise
cap, Poisson tail, dense spike with Nelson/EWMA/momentum stacking,
partial-month velocity, and the conditional safe zone.
"""

from __future__ import annotations

import math

import pytest

from claim_analysis_engine_spark.risk_engine import (
    nbinom_cdf,
    poisson_cdf,
    score_at_target,
    score_series,
)


def months_for(n: int) -> list[int]:
    """Calendar months 1..12 cycling, ending anywhere — the tree only
    reads the last entry (target month) and per-entry month-of-year."""
    return [(i % 12) + 1 for i in range(n)]


def run(values, **kw):
    return score_series(values, months_for(len(values)), **kw)


# ----------------------------------------------------------- tail CDFs

def test_poisson_cdf_known_values():
    assert poisson_cdf(0, 1.0) == pytest.approx(math.exp(-1))
    assert poisson_cdf(2, 1.0) == pytest.approx(math.exp(-1) * 2.5)
    assert poisson_cdf(-1, 5.0) == 0.0


def test_nbinom_cdf_geometric_case():
    # r=1 makes NB geometric: P(X ≤ k) = 1 − (1−p)^(k+1)
    assert nbinom_cdf(0, 1.0, 0.5) == pytest.approx(0.5)
    assert nbinom_cdf(2, 1.0, 0.5) == pytest.approx(0.875)


# ------------------------------------------------------------ branches

def test_no_occurrence():
    r = run([1, 2, 5, 0])
    assert (r["score"], r["status"], r["reason"]) == (0, "", "발생 없음")


def test_cold_start_critical_red():
    r = run([1, 0, 3], grade="중대")
    assert (r["score"], r["status"], r["reason"]) == (100, "🔴", "초기급증()")


def test_cold_start_critical_falls_through():
    # reference quirk (core/analytics.py:250-252): critical with x < 2
    # has no else — continues into regime scoring instead of returning
    r = run([0, 0, 1], grade="중대")
    assert r["reason"] != "데이터 부족"


def test_cold_start_general_yellow_and_white():
    r = run([0, 1, 5])
    assert (r["score"], r["status"], r["reason"]) == (50, "🟡", "초기주의()")
    r = run([0, 1, 2])
    assert (r["score"], r["status"], r["reason"]) == (0, "⚪", "데이터 부족")


def test_sparse_first_occurrence_general_capped_at_59():
    # all-zero history → breakout 100, but a single-count first
    # occurrence on a general grade caps at THRESHOLD_YEL_GEN−1 = 59,
    # landing in the white band → 정상범주 (reference :321-333)
    r = run([0, 0, 0, 0, 0, 0, 1])
    assert (r["score"], r["status"], r["reason"]) == (59, "⚪", "정상범주")


def test_sparse_first_occurrence_critical_uncapped():
    r = run([0, 0, 0, 0, 0, 0, 1], grade="위험")
    assert (r["score"], r["status"]) == (100, "🔴")
    assert r["reason"] == "⚡돌발감지(희소유형 돌발 발생)"


def test_sparse_poisson_tail_with_trend_and_momentum():
    vals = [1, 1, 0, 1, 0, 1, 4]
    mu = 4 / 6
    p_val = 1 - poisson_cdf(3, mu)
    expected = -math.log10(p_val) * 25  # tail
    expected += 20  # sparse trend: 4/1 ≥ 3 and x ≥ 3
    expected += 15  # momentum: 4 > 1 > 0 and x ≥ 3
    r = run(vals)
    assert r["score"] == int(min(100.0, expected))
    assert r["status"] == "🔴"  # ≥ 85 general
    assert r["reason"] == "📈급증감지(연속 상승 모멘텀)"


def test_sparse_single_count_noise_cap_30():
    # x=1, not first occurrence (mean > 0), not rare breakout (prev=1)
    vals = [0, 1, 1, 0, 1, 1, 1]
    mu = 4 / 6
    expected = int(-math.log10(1 - poisson_cdf(0, mu)) * 25)
    r = run(vals)
    assert r["score"] == min(expected, 30)
    assert r["status"] == "⚪"


def test_dense_flat_series_is_safe_zone():
    # constant history, current below 3σ and x ≥ 3 → not in safe range,
    # but z = 0 and no rules → score 0 white
    r = run([10] * 36 + [10])
    assert (r["score"], r["status"], r["reason"]) == (0, "⚪", "정상범주")


def test_dense_safe_zone_forces_zero():
    # dense noisy series (std ≈ 5.2, cv > 0.5 → limit 3.5), tiny current
    # count: z ≈ −1.53 stays inside ±limit, no pattern rule → safe zone.
    # (A LOW-variance history would instead fire rule 1 on |z| and block
    # the safe zone — the abs() is reference behavior.)
    r = run([5, 15] * 6 + [2])
    assert (r["score"], r["status"], r["reason"]) == (0, "⚪", "정상범주")


def test_dense_spike_stacks_rules():
    # alternating 8/12 (seasonal, period-aligned) then a 60 spike:
    # base 50 (z ≫ limit) + rule1 30 + EWMA 15 + momentum 15 → capped 100
    vals = [8, 12] * 18 + [60]
    r = run(vals)
    assert (r["score"], r["status"]) == (100, "🔴")
    assert r["reason"] == "📊추세이탈(정상범위 이탈) / 📈급증감지(연속 상승 모멘텀)"


def test_partial_month_velocity():
    # constant 10 history, current 12 at 50% month progress:
    # x ≥ mean before 70% progress → +30 상승세 가속; std=0 makes z huge
    # → base 50 + rule1 30 + EWMA 15 + partial 30 → capped 100
    r = run([10] * 12 + [12], is_partial_month=True, progress_ratio=0.5)
    assert (r["score"], r["status"]) == (100, "🔴")
    assert r["reason"] == "📊추세이탈(정상범위 이탈) / 📈급증감지(상승세 가속)"


def test_critical_bonus_and_thresholds():
    # same series scored under both grades: critical adds +10 and uses
    # lower thresholds (75/50 vs 85/60)
    vals = [10, 11, 9, 10, 12, 8] * 4 + [14]
    gen = run(vals)
    crit = run(vals, grade="중대")
    if gen["score"] > 0:
        assert crit["score"] >= gen["score"]


def test_wrapper_target_absent():
    assert score_at_target([1, 2], [1, 2], target_present=False) == ("🟢", 0, "당월0건")


def test_wrapper_matches_engine():
    vals = [8, 12] * 18 + [60]
    status, score, reason = score_at_target(
        vals, months_for(len(vals)), target_present=True
    )
    r = run(vals)
    assert (status, score, reason) == (r["status"], r["score"], r["reason"])
