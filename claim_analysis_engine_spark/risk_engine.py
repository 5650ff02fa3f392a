"""Pure-Python risk scoring engine: the reference's per-series decision
tree (reference core/analytics.py:58-388) as one pure function over a
numpy month-count vector.

No Spark imports here — operators/risk.py wraps `score_series` in a
`groupBy(keys).applyInPandas(...)`, and tests/test_risk_golden.py
golden-tests the tree directly against hand-computed cases.

Deliberate, documented deviations from the reference:

* `as_of` is injected (``progress_ratio`` / ``is_partial_month``
  arguments) instead of ``datetime.now()`` (reference
  core/analytics.py:69-82) so results are deterministic.
* The reference dense branch calls ``self._calculate_velocity_score()``
  (core/analytics.py:286) which is DEFINED NOWHERE in the reference —
  at runtime the dense branch raises AttributeError and the UI wrapper
  (core/analytics.py:425-426) masks every dense series to
  ("⚪", 0, "Err"). We implement the intended semantics with a velocity
  term of 0.0 (the partial-month guards already cover velocity).
* scipy/statsmodels are not dependencies: Poisson / negative-binomial
  tail CDFs are computed in closed form with ``math.lgamma`` (exact
  same series sums scipy evaluates), and the STL branch implements the
  classical additive decomposition that
  ``statsmodels.tsa.seasonal_decompose(model='additive', period=12)``
  performs (centered 13-point MA trend with half end-weights, per-
  calendar-month de-meaned seasonal averages).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

__all__ = ["RiskConfig", "score_series", "score_at_target", "CRITICAL_GRADES"]


@dataclass(frozen=True)
class RiskConfig:
    """Scoring constants (reference core/analytics.py:21-53)."""

    MIN_DATA_POINTS: int = 3
    MIN_SAMPLE_FOR_NB: int = 6
    EWMA_LAMBDA: float = 0.2
    NELSON_WINDOW_BIAS: int = 9
    NELSON_WINDOW_TREND: int = 6
    STL_MIN_PERIODS: int = 24
    SCORE_ACCIDENT: int = 100
    SCORE_CRITICAL_BONUS: int = 10
    SCORE_NELSON_DEV: int = 30
    SCORE_NELSON_BIAS: int = 20
    SCORE_NELSON_TREND: int = 20
    SCORE_MOMENTUM: int = 15
    SCORE_PARTIAL_ABS: int = 30
    SCORE_PARTIAL_VEL: int = 40
    SCORE_PARTIAL_WARN: int = 30
    THRESHOLD_RED_CRIT: int = 75
    THRESHOLD_RED_GEN: int = 85
    THRESHOLD_YEL_CRIT: int = 50
    THRESHOLD_YEL_GEN: int = 60
    MIN_PROGRESS_FOR_VELOCITY: float = 0.2


# Reference core/analytics.py:56
CRITICAL_GRADES = {"중대", "위험", "사고"}

_CFG = RiskConfig()


# ------------------------------------------------------------------ tails

def poisson_cdf(k: int, mu: float) -> float:
    """P(X ≤ k) for X ~ Poisson(mu), exact series sum in log space
    (what scipy.stats.poisson.cdf evaluates; reference
    core/analytics.py:121)."""
    if k < 0:
        return 0.0
    return float(
        sum(
            math.exp(-mu + (j * math.log(mu) if j else 0.0) - math.lgamma(j + 1))
            for j in range(int(k) + 1)
        )
    )


def nbinom_cdf(k: int, r: float, p: float) -> float:
    """P(X ≤ k) for X ~ NB(r, p) (scipy parameterization: number of
    failures before the r-th success; reference core/analytics.py:118)."""
    if k < 0:
        return 0.0
    return float(
        sum(
            math.exp(
                math.lgamma(j + r)
                - math.lgamma(r)
                - math.lgamma(j + 1)
                + r * math.log(p)
                + j * math.log(1.0 - p)
            )
            for j in range(int(k) + 1)
        )
    )


# ------------------------------------------------------- decomposition

def _stl_z(
    history: np.ndarray, hist_months: np.ndarray, x: float, target_month: int
) -> tuple[float, str] | None:
    """Classical additive decomposition z (reference
    core/analytics.py:144-162, statsmodels seasonal_decompose
    period=12). Returns None when the decomposition can't run — caller
    falls back to the plain z (mirrors the reference try/except)."""
    n = len(history)
    if n < 13:
        return None
    trend = np.full(n, np.nan)
    for t in range(6, n - 6):
        trend[t] = (
            0.5 * history[t - 6] + history[t - 5 : t + 6].sum() + 0.5 * history[t + 6]
        ) / 12.0
    if np.isnan(trend).all():
        return None
    detr = history - trend

    # per-calendar-month averages of the detrended series, then de-mean
    # across the observed positions (statsmodels seasonal_mean)
    months_present = sorted({int(m) for m in hist_months})
    period_avg = {}
    for m in months_present:
        vals = detr[(hist_months == m) & ~np.isnan(detr)]
        if len(vals):
            period_avg[m] = float(vals.mean())
    if target_month not in period_avg:
        return None
    grand = float(np.mean(list(period_avg.values())))
    seasonal = {m: v - grand for m, v in period_avg.items()}

    resid = np.array(
        [
            detr[i] - seasonal[int(hist_months[i])]
            if not np.isnan(detr[i]) and int(hist_months[i]) in seasonal
            else np.nan
            for i in range(n)
        ]
    )
    ok = ~np.isnan(resid)
    if ok.sum() < 2:
        return None
    resid_mean = float(resid[ok].mean())
    resid_std = float(resid[ok].std(ddof=1))
    last_trend = float(trend[~np.isnan(trend)][-1])
    expected = last_trend + seasonal[target_month]
    z = ((x - expected) - resid_mean) / (resid_std + 1e-6)
    return z, "정상패턴 이탈"


# --------------------------------------------------------------- engine

def score_series(
    values,
    months,
    grade: str | None = None,
    progress_ratio: float = 1.0,
    is_partial_month: bool = False,
    cfg: RiskConfig = _CFG,
) -> dict:
    """Score one monthly series whose LAST entry is the target month.

    ``values``: zero-filled ascending month counts (history + current).
    ``months``: calendar month number (1-12) per entry.
    Port of RiskScoringEngine.calculate_score (reference
    core/analytics.py:214-388); see module docstring for deviations.
    Returns {"score": int, "status": str, "reason": str}.
    """
    values = np.asarray(values, dtype=float)
    months = np.asarray(months, dtype=int)
    is_critical = grade in CRITICAL_GRADES if grade else False

    if len(values) == 0:
        x = 0.0
        history = np.array([])
        hist_months = np.array([], dtype=int)
        target_month = 0
    else:
        x = float(values[-1])
        history = values[:-1]
        hist_months = months[:-1]
        target_month = int(months[-1])

    n_obs = len(history)
    mean = float(history.mean()) if n_obs > 0 else 0.0
    std = float(history.std(ddof=1)) if n_obs > 1 else 0.0
    var = float(history.var(ddof=1)) if n_obs > 1 else 0.0
    zero_ratio = float((history == 0).sum() / n_obs) if n_obs > 0 else 0.0
    is_sparse = (mean < 1.0) or (zero_ratio > 0.5)

    # 0. no occurrence (reference :216-217)
    if x == 0:
        return {"score": 0, "status": "", "reason": "발생 없음"}

    # 1. partial-month early warning (reference :219-240)
    partial_penalty = 0.0
    partial_reason = ""
    if is_partial_month and x > 1:
        if x >= mean and mean > 0 and progress_ratio < 0.7:
            partial_penalty = cfg.SCORE_PARTIAL_ABS
            partial_reason = "상승세 가속"
        elif progress_ratio >= cfg.MIN_PROGRESS_FOR_VELOCITY:
            expected_current = mean * progress_ratio
            if expected_current > 0.5 and x > expected_current * 4.0:
                partial_penalty = cfg.SCORE_PARTIAL_VEL
                partial_reason = "상승세 가속"
            elif expected_current > 0.5 and x > expected_current * 2.5 and is_critical:
                partial_penalty = cfg.SCORE_PARTIAL_WARN
                partial_reason = "상승세 가속"

    # 3. cold start (reference :247-257; critical x<2 falls THROUGH —
    # a reference quirk we replicate)
    if n_obs < cfg.MIN_DATA_POINTS:
        if is_critical:
            if x >= 2:
                return {"score": 100, "status": "🔴", "reason": f"초기급증({partial_reason})"}
        else:
            if x >= 3:
                return {"score": 50, "status": "🟡", "reason": f"초기주의({partial_reason})"}
            return {"score": 0, "status": "⚪", "reason": "데이터 부족"}

    total = 0.0
    method_str = ""
    triggered: list[str] = []
    z_val = 0.0

    if is_sparse:
        # Track A (reference :101-129)
        if mean == 0:
            prob_score = 100.0 if x > 0 else 0.0
            method_str = "희소유형 돌발 발생"
        else:
            use_nb = n_obs >= cfg.MIN_SAMPLE_FOR_NB and var > 1.2 * mean
            if use_nb:
                p_est = mean / var
                r_est = (mean * p_est) / (1 - p_est)
                p_val = 1.0 - nbinom_cdf(int(x) - 1, r_est, p_est)
            else:
                p_val = 1.0 - poisson_cdf(int(x) - 1, mean)
            method_str = "분포 이탈"
            if p_val < 1e-5:
                prob_score = 100.0
            else:
                prob_score = min(100.0, max(0.0, -math.log10(p_val) * 25))
        trend_score = 0.0
        prev = float(history[-1]) if n_obs > 0 else 0.0
        if prev > 0 and (x / prev) >= 3.0 and x >= 3:
            trend_score = 20.0
        total = prob_score + trend_score
    else:
        # Track B (reference :270-288)
        stl = (
            _stl_z(history, hist_months, x, target_month)
            if n_obs >= cfg.STL_MIN_PERIODS and std > 0
            else None
        )
        if stl is not None:
            z_val, method_str = stl
        else:
            z_val = (x - mean) / (std + 1e-6)
            method_str = "평균 대비 급증"

        start_sigma = 0.5 if is_critical else 1.0
        base_score = min(50.0, max(0.0, (z_val - start_sigma) * (50.0 / 2.0)))

        # Nelson rules (reference :169-212) on the FULL series (incl x)
        cv = (std / mean) if mean > 0 else 0.0
        base_limit = 2.5 if is_critical else 3.0
        if cv < 0.1 and mean > 1.0:
            limit_z = 2.0
        elif cv > 0.5:
            limit_z = 3.5
        else:
            limit_z = base_limit
        warn_z = max(1.5, limit_z - 1.0)
        nelson = 0.0
        if abs(z_val) > limit_z:
            triggered.append("정상범위 이탈")
            nelson += cfg.SCORE_NELSON_DEV
        elif abs(z_val) > warn_z:
            nelson += cfg.SCORE_NELSON_DEV / 2
        full = values
        if len(full) >= cfg.NELSON_WINDOW_BIAS:
            if (full[-cfg.NELSON_WINDOW_BIAS :] > mean).all():
                triggered.append(f"지속적 상승 - {cfg.NELSON_WINDOW_BIAS}개월")
                nelson += cfg.SCORE_NELSON_BIAS
        if len(full) >= cfg.NELSON_WINDOW_TREND:
            diffs = np.diff(full[-cfg.NELSON_WINDOW_TREND :])
            if (diffs > 0).all():
                triggered.append(f"지속적 상승 - ({cfg.NELSON_WINDOW_TREND}개월)")
                nelson += cfg.SCORE_NELSON_TREND

        # EWMA control chart, adjust=False recursion (reference :281-283)
        lam = cfg.EWMA_LAMBDA
        ewma = float(full[0])
        for v in full[1:]:
            ewma = (1 - lam) * ewma + lam * float(v)
        z_ewma = (ewma - mean) / (std * math.sqrt(lam / (2 - lam)) + 1e-6)
        ewma_score = 15.0 if abs(z_ewma) > 3.0 else 0.0

        # velocity term: reference calls an UNDEFINED method here
        # (core/analytics.py:286) — intended semantics restored as 0.0
        velocity_score = 0.0
        total = base_score + nelson + ewma_score + velocity_score

    # momentum (reference :131-142, applied :290-294)
    momentum = 0.0
    if n_obs >= 2:
        if x > history[-1] > history[-2] and x >= 3:
            momentum = float(cfg.SCORE_MOMENTUM)
    if momentum > 0:
        triggered.append("연속 상승 모멘텀")
    total += momentum

    # 5. final aggregation (reference :296-302)
    total += partial_penalty
    if is_critical and total > 0:
        total += cfg.SCORE_CRITICAL_BONUS
    total = min(100.0, total)

    # safe zone, dense only (reference :304-319)
    if not is_sparse:
        if (x < 3) and (z_val < 0.8) and not triggered and not partial_reason:
            return {"score": 0, "status": "⚪", "reason": "정상범주"}

    # single-count suppression (reference :321-333)
    if x == 1:
        first_occurrence = mean == 0
        rare_breakout = is_sparse and n_obs > 0 and history[-1] == 0
        if first_occurrence or rare_breakout:
            if not is_critical:
                total = min(total, cfg.THRESHOLD_YEL_GEN - 1)
        else:
            total = min(total, 30.0)
            partial_reason = ""

    # 6. status + reason consolidation (reference :335-388)
    reason_parts = []
    if partial_reason:
        reason_parts.append(partial_reason)
    reason_parts.extend(triggered)
    if not reason_parts:
        reason_parts.append(method_str)

    cat_sudden = [p for p in reason_parts if any(k in p for k in ("희소유형 돌발 발생", "분포 이탈"))]
    cat_trend = [
        p for p in reason_parts if any(k in p for k in ("정상패턴 이탈", "정상범위 이탈", "평균 대비 급증"))
    ]
    cat_mom = [
        p for p in reason_parts if any(k in p for k in ("지속적 상승", "연속 상승 모멘텀", "상승세 가속"))
    ]
    reason_str = ""
    if cat_sudden:
        reason_str = f"⚡돌발감지({', '.join(cat_sudden)})"
    if cat_trend:
        reason_str += (" / " if reason_str else "") + f"📊추세이탈({', '.join(cat_trend)})"
    if cat_mom:
        reason_str += (" / " if reason_str else "") + f"📈급증감지({', '.join(cat_mom)})"
    if not reason_str:
        reason_str = method_str if method_str else "정상범주"

    thr_red = cfg.THRESHOLD_RED_CRIT if is_critical else cfg.THRESHOLD_RED_GEN
    thr_yel = cfg.THRESHOLD_YEL_CRIT if is_critical else cfg.THRESHOLD_YEL_GEN
    status = "⚪"
    if total >= thr_red:
        status = "🔴"
    elif total >= thr_yel:
        status = "🟡"
    if is_sparse and x == 2 and is_critical and mean >= 0.5:
        status = "🟡"

    if status == "⚪":
        return {"score": int(total), "status": "⚪", "reason": "정상범주"}
    return {"score": int(total), "status": status, "reason": reason_str}


def score_at_target(
    values,
    months,
    target_present: bool,
    grade: str | None = None,
    progress_ratio: float = 1.0,
    is_partial_month: bool = False,
) -> tuple[str, int, str]:
    """UI-wrapper semantics (reference core/analytics.py:411-426):
    target month absent from the series → ("🟢", 0, "당월0건"); any
    internal error → ("⚪", 0, "Err")."""
    try:
        if not target_present:
            return "🟢", 0, "당월0건"
        r = score_series(
            values,
            months,
            grade=grade,
            progress_ratio=progress_ratio,
            is_partial_month=is_partial_month,
        )
        return r["status"], r["score"], r["reason"]
    except Exception:
        return "⚪", 0, "Err"
