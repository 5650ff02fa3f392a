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


def _split_exog(exog, n_train: int):
    """Split an optional exog series alongside the temporal split."""
    if exog is None:
        return None, None
    exog = np.asarray(exog, float)
    return exog[:n_train], exog[n_train:]


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

    def fit(self, y, exog=None) -> "HoltWinters":
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

    def predict(self, steps: int, exog_future=None) -> np.ndarray:
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

    def fit(self, y, exog=None) -> "LagLinear":
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

    def predict(self, steps: int, exog_future=None) -> np.ndarray:
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

    def fit(self, y, exog=None) -> "SeasonalNaiveDrift":
        self._y = np.asarray(y, float)
        return self

    def predict(self, steps: int, exog_future=None) -> np.ndarray:
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


# ------------------------------------------------- upgraded slots
# Each numpy slot has a real-library twin with the SAME fit/predict/
# params interface; slot_factory()/slot_grid() below dispatch on the
# HAVE_* flags so the upgrade engages transparently wherever the libs
# exist. Library calls live inside methods (import at call time) so the
# dispatch itself is testable with sys.modules fakes — see
# tests/test_forecast_upgrade.py.

class SarimaxSlot:
    """statsmodels SARIMAX twin of the ``hw`` slot (reference
    core/engine/models.py:95-173): SARIMAX(p,d,q)×(P,D,Q,12) with
    optional exog, enforce_stationarity/invertibility False,
    maxiter 200, forecasts clipped at 0."""

    name = "hw"

    def __init__(self, order=(1, 1, 1), seasonal_order=(1, 1, 1, 12)):
        self.order = tuple(order)
        self.seasonal_order = tuple(seasonal_order)
        self._results = None

    def fit(self, y, exog=None) -> "SarimaxSlot":
        from statsmodels.tsa.statespace.sarimax import SARIMAX

        self._results = SARIMAX(
            np.asarray(y, float),
            exog=None if exog is None else np.asarray(exog, float),
            order=self.order,
            seasonal_order=self.seasonal_order,
            enforce_stationarity=False,
            enforce_invertibility=False,
        ).fit(disp=False, maxiter=200)
        self._used_exog = exog is not None
        return self

    def predict(self, steps: int, exog_future=None) -> np.ndarray:
        if self._used_exog and exog_future is None:
            # reference raises when exog was trained but not supplied
            # for the forecast window (models.py:159-161); we pad zeros
            # to match join_exog_align's missing-month contract
            exog_future = np.zeros(steps)
        fc = self._results.forecast(
            steps,
            exog=None if exog_future is None else np.asarray(exog_future, float),
        )
        return np.maximum(0.0, np.asarray(fc, float))

    def params(self) -> dict:
        return {
            "order": list(self.order),
            "seasonal_order": list(self.seasonal_order),
        }


class CatBoostSlot:
    """CatBoost twin of the ``laglin`` slot (reference
    models.py:190-303): lag-1..k features, CatBoostRegressor with a
    fixed seed, recursive multi-step prediction feeding its own
    outputs — identical feature/predict shape to LagLinear."""

    name = "laglin"

    def __init__(self, lag_features: int = 3, iterations: int = 100):
        self.lag_features = lag_features
        self.iterations = iterations
        self._model = None
        self._tail: np.ndarray | None = None

    def fit(self, y, exog=None) -> "CatBoostSlot":
        from catboost import CatBoostRegressor

        y = np.asarray(y, float)
        k = min(self.lag_features, max(1, len(y) - 1))
        self.lag_features = k
        X = np.array([y[t - k : t][::-1] for t in range(k, len(y))])
        self._model = CatBoostRegressor(
            iterations=self.iterations, random_seed=42, verbose=0
        )
        self._model.fit(X, y[k:])
        self._tail = y[-k:].copy()
        return self

    def predict(self, steps: int, exog_future=None) -> np.ndarray:
        tail = list(self._tail)
        out = []
        for _ in range(steps):
            feats = np.array(tail[-self.lag_features :][::-1]).reshape(1, -1)
            yhat = max(0.0, float(np.asarray(self._model.predict(feats)).ravel()[0]))
            out.append(yhat)
            tail.append(yhat)
        return np.array(out)

    def params(self) -> dict:
        return {"lag_features": self.lag_features, "iterations": self.iterations}


def _lstm_fit_forecast(
    y: np.ndarray,
    steps: int,
    lookback: int = 12,
    hidden_size: int = 64,
    epochs: int = 100,
    batch_size: int = 16,
) -> np.ndarray:
    """All torch code for the LSTM slot in one function (reference
    models.py:310-474): min-max scale, sliding-window dataset,
    LSTM→Linear head, Adam/MSE training, recursive forecast. Seeded
    torch.manual_seed(42) for determinism. Kept separate so the slot's
    dispatch/plumbing is testable without faking torch's autograd."""
    import torch
    from torch import nn

    torch.manual_seed(42)
    y = np.asarray(y, float)
    lo, hi = float(y.min()), float(y.max())
    scale = (hi - lo) or 1.0
    ys = (y - lo) / scale
    lb = min(lookback, max(1, len(ys) - 1))
    X = np.array([ys[i : i + lb] for i in range(len(ys) - lb)])
    t = ys[lb:]

    class Net(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.lstm = nn.LSTM(1, hidden_size, batch_first=True)
            self.head = nn.Linear(hidden_size, 1)

        def forward(self, x):
            out, _ = self.lstm(x)
            return self.head(out[:, -1, :])

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=0.01)
    loss_fn = nn.MSELoss()
    Xt = torch.tensor(X, dtype=torch.float32).unsqueeze(-1)
    tt = torch.tensor(t, dtype=torch.float32).unsqueeze(-1)
    for _ in range(epochs):
        for i in range(0, len(Xt), batch_size):
            opt.zero_grad()
            loss = loss_fn(net(Xt[i : i + batch_size]), tt[i : i + batch_size])
            loss.backward()
            opt.step()
    window = list(ys[-lb:])
    out = []
    with torch.no_grad():
        for _ in range(steps):
            x = torch.tensor(window[-lb:], dtype=torch.float32).reshape(1, lb, 1)
            yhat = float(net(x).ravel()[0])
            out.append(yhat)
            window.append(yhat)
    return np.maximum(0.0, np.array(out) * scale + lo)


class LSTMSlot:
    """torch-LSTM twin of the ``snaive`` slot (reference
    models.py:310-474). fit() stores the series; predict() trains and
    forecasts via _lstm_fit_forecast (fit-at-predict is fine for the
    per-series applyInPandas shape — each series trains exactly once)."""

    name = "snaive"

    def __init__(self, lookback: int = 12, hidden_size: int = 64, epochs: int = 100, batch_size: int = 16):
        self.lookback = lookback
        self.hidden_size = hidden_size
        self.epochs = epochs
        self.batch_size = batch_size
        self._y: np.ndarray | None = None

    def fit(self, y, exog=None) -> "LSTMSlot":
        self._y = np.asarray(y, float)
        return self

    def predict(self, steps: int, exog_future=None) -> np.ndarray:
        return _lstm_fit_forecast(
            self._y,
            steps,
            lookback=self.lookback,
            hidden_size=self.hidden_size,
            epochs=self.epochs,
            batch_size=self.batch_size,
        )

    def params(self) -> dict:
        return {
            "lookback": self.lookback,
            "hidden_size": self.hidden_size,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
        }


# deterministic grids for the upgraded slots: fixed-order subsets of
# the reference's Optuna search spaces (trainer.py:217-222 SARIMAX
# p,d,q∈[0,2] D∈[0,1]; :275-276 catboost; :330-332 lstm), small enough
# for grid search to stand in for 50 seeded TPE trials
UPGRADED_GRIDS: dict[str, list[dict]] = {
    "hw": [
        {"order": (1, 1, 1), "seasonal_order": (1, 1, 1, 12)},
        {"order": (0, 1, 1), "seasonal_order": (0, 1, 1, 12)},
        {"order": (2, 1, 2), "seasonal_order": (1, 1, 0, 12)},
        {"order": (1, 0, 0), "seasonal_order": (1, 0, 1, 12)},
    ],
    "laglin": [
        {"lag_features": k, "iterations": n} for k in (2, 3, 6) for n in (100, 200)
    ],
    "snaive": [
        {"lookback": lb, "hidden_size": h, "epochs": 100}
        for lb in (6, 12)
        for h in (32, 64)
    ],
}

_UPGRADES: dict[str, tuple[str, type]] = {
    # slot id -> (HAVE_* flag name, upgraded class)
    "hw": ("HAVE_STATSMODELS", SarimaxSlot),
    "laglin": ("HAVE_CATBOOST", CatBoostSlot),
    "snaive": ("HAVE_TORCH", LSTMSlot),
}


def _upgraded(name: str) -> bool:
    flag, _ = _UPGRADES[name]
    return bool(globals()[flag])


def slot_factory(name: str) -> type:
    """The class backing a slot in THIS environment: the real-library
    twin when importable, the numpy stand-in otherwise."""
    if _upgraded(name):
        return _UPGRADES[name][1]
    return _FACTORY[name]


def slot_grid(name: str) -> list[dict]:
    """The tuning grid matching slot_factory(name)'s constructor."""
    if _upgraded(name):
        return UPGRADED_GRIDS[name]
    return GRIDS[name]


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


def tune_model(name: str, y: np.ndarray, test_months: int = TEST_MONTHS, exog=None):
    """Grid search one family: fit on train, score test RMSE, first
    minimum wins (deterministic trial order). Failed fits score inf
    (reference trainer.py failed-trial → inf). The grid and factory
    come from slot_grid/slot_factory, so the same call tunes the real
    SARIMAX/CatBoost/LSTM families wherever their libraries exist."""
    train, test = temporal_split(y, test_months)
    ex_train, ex_test = _split_exog(exog, len(train))
    grid = slot_grid(name)
    best_params, best_rmse = None, math.inf
    for params in grid:
        try:
            model = slot_factory(name)(**params).fit(train, exog=ex_train)
            score = rmse(model.predict(len(test), exog_future=ex_test), test)
        except Exception:
            score = math.inf
        if score < best_rmse:
            best_params, best_rmse = params, score
    return best_params or grid[0], best_rmse


@dataclass
class ChampionResult:
    leaderboard: list[dict]  # [{model, params, rmse, rank}]
    champion: str
    champion_params: dict


def select_champion(
    y: np.ndarray, test_months: int = TEST_MONTHS, exog=None
) -> ChampionResult:
    """Tune all families, rank by test RMSE ascending (ties break by
    model name for determinism), champion = rank 1 (reference
    trainer.py:405-570)."""
    rows = []
    for name in sorted(GRIDS):
        params, score = tune_model(name, y, test_months, exog=exog)
        rows.append({"model": name, "params": params, "rmse": score})
    rows.sort(key=lambda r: (r["rmse"], r["model"]))
    for i, r in enumerate(rows):
        r["rank"] = i + 1
    best = rows[0]
    return ChampionResult(rows, best["model"], best["params"])


def forecast_with_champion(
    y: np.ndarray,
    steps: int,
    test_months: int = TEST_MONTHS,
    exog=None,
    exog_future=None,
):
    """Champion refit on the FULL series before forecasting (reference
    trainer.py:548-570). Returns (model_name, params, forecast, rmse).
    When exog is given and exog_future is not, the forecast window pads
    zeros (the reference pads missing exog months with zeros)."""
    result = select_champion(y, test_months, exog=exog)
    model = slot_factory(result.champion)(**result.champion_params).fit(y, exog=exog)
    if exog is not None and exog_future is None:
        exog_future = np.zeros(steps)
    fc = model.predict(steps, exog_future=exog_future)
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
