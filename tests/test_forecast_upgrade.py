"""Branch tests for the real-model upgrade path in forecast_models:
statsmodels/catboost/torch are not installed in this environment, so
the HAVE_* dispatch and the parameter plumbing into each library's API
are exercised with lightweight sys.modules fakes that record exactly
what they were called with. Where the real libraries ARE importable
(any richer environment), the skip-marked tests at the bottom run the
true fit/forecast paths instead — so the upgrade branches are executed
by at least one test in every environment.

No Spark needed: these are pure driver-side model-family tests.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

import claim_analysis_engine_spark.forecast_models as fm

Y = np.array(
    [10, 12, 9, 14, 11, 13, 15, 12, 16, 13, 17, 14, 12, 15, 11, 16, 13, 15, 18, 14],
    dtype=float,
)
EXOG = np.linspace(100.0, 120.0, len(Y))


# ------------------------------------------------------------- fakes

class _FakeSarimaxResults:
    def __init__(self, endog, calls):
        self._endog = endog
        self._calls = calls

    def forecast(self, steps, exog=None):
        self._calls.append(("forecast", steps, None if exog is None else np.asarray(exog)))
        return np.full(steps, float(np.mean(self._endog)))


class _FakeSARIMAX:
    calls: list = []

    def __init__(self, endog, exog=None, order=None, seasonal_order=None,
                 enforce_stationarity=None, enforce_invertibility=None):
        type(self).calls.append(
            {
                "endog": np.asarray(endog),
                "exog": None if exog is None else np.asarray(exog),
                "order": order,
                "seasonal_order": seasonal_order,
                "enforce_stationarity": enforce_stationarity,
                "enforce_invertibility": enforce_invertibility,
            }
        )
        self._endog = np.asarray(endog)

    def fit(self, disp=None, maxiter=None):
        type(self).calls[-1]["fit_kwargs"] = {"disp": disp, "maxiter": maxiter}
        return _FakeSarimaxResults(self._endog, type(self).calls[-1].setdefault("res_calls", []))


@pytest.fixture()
def fake_statsmodels(monkeypatch):
    _FakeSARIMAX.calls = []
    root = types.ModuleType("statsmodels")
    tsa = types.ModuleType("statsmodels.tsa")
    statespace = types.ModuleType("statsmodels.tsa.statespace")
    sarimax_mod = types.ModuleType("statsmodels.tsa.statespace.sarimax")
    sarimax_mod.SARIMAX = _FakeSARIMAX
    for name, mod in [
        ("statsmodels", root),
        ("statsmodels.tsa", tsa),
        ("statsmodels.tsa.statespace", statespace),
        ("statsmodels.tsa.statespace.sarimax", sarimax_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    monkeypatch.setattr(fm, "HAVE_STATSMODELS", True)
    return _FakeSARIMAX


class _FakeCatBoostRegressor:
    calls: list = []

    def __init__(self, iterations=None, random_seed=None, verbose=None):
        type(self).calls.append(
            {"iterations": iterations, "random_seed": random_seed, "verbose": verbose}
        )
        self._mean = 0.0

    def fit(self, X, y):
        type(self).calls[-1]["X_shape"] = np.asarray(X).shape
        type(self).calls[-1]["y_len"] = len(y)
        self._mean = float(np.mean(y))
        return self

    def predict(self, X):
        return np.full(len(np.asarray(X)), self._mean)


@pytest.fixture()
def fake_catboost(monkeypatch):
    _FakeCatBoostRegressor.calls = []
    mod = types.ModuleType("catboost")
    mod.CatBoostRegressor = _FakeCatBoostRegressor
    monkeypatch.setitem(sys.modules, "catboost", mod)
    monkeypatch.setattr(fm, "HAVE_CATBOOST", True)
    return _FakeCatBoostRegressor


# ----------------------------------------------- numpy-env baseline

def test_factories_fall_back_to_numpy_without_libs():
    """In this environment the flags are genuinely False, so dispatch
    must return the numpy stand-ins and the matching grids."""
    if not fm.HAVE_STATSMODELS:
        # since round 6 the no-statsmodels hw slot is the exact numpy
        # state-space SARIMAX, not the Holt-Winters smoother
        assert fm.slot_factory("hw") is fm.NumpySarimax
        assert fm.slot_grid("hw") is fm.GRIDS["hw"]
    if not fm.HAVE_CATBOOST:
        # since round 6 the no-catboost laglin slot is real boosted
        # trees (NumpyGBDT), not the lag-OLS approximation
        assert fm.slot_factory("laglin") is fm.NumpyGBDT
    if not fm.HAVE_TORCH:
        # since round 6 the no-torch snaive slot is a real numpy-BPTT
        # LSTM, not the seasonal-naive baseline
        assert fm.slot_factory("snaive") is fm.NumpyLSTM


# ------------------------------------------------- statsmodels slot

def test_sarimax_dispatch_and_plumbing(fake_statsmodels):
    assert fm.slot_factory("hw") is fm.SarimaxSlot
    assert fm.slot_grid("hw") is fm.UPGRADED_GRIDS["hw"]

    model = fm.SarimaxSlot(order=(2, 1, 2), seasonal_order=(1, 1, 0, 12))
    model.fit(Y, exog=EXOG)
    call = fake_statsmodels.calls[-1]
    assert call["order"] == (2, 1, 2)
    assert call["seasonal_order"] == (1, 1, 0, 12)
    assert call["enforce_stationarity"] is False
    assert call["enforce_invertibility"] is False
    assert call["fit_kwargs"] == {"disp": False, "maxiter": 200}
    np.testing.assert_array_equal(call["endog"], Y)
    np.testing.assert_array_equal(call["exog"], EXOG)

    fc = model.predict(3, exog_future=np.array([1.0, 2.0, 3.0]))
    assert fc.shape == (3,)
    assert np.all(fc >= 0)
    kind, steps, ex = call["res_calls"][-1]
    assert (kind, steps) == ("forecast", 3)
    np.testing.assert_array_equal(ex, [1.0, 2.0, 3.0])

    # exog trained but no future exog supplied -> zero padding
    model.predict(2)
    _, _, ex = call["res_calls"][-1]
    np.testing.assert_array_equal(ex, [0.0, 0.0])


def test_sarimax_tune_runs_upgraded_grid_with_split_exog(fake_statsmodels):
    params, score = fm.tune_model("hw", Y, exog=EXOG)
    assert params in fm.UPGRADED_GRIDS["hw"]
    assert np.isfinite(score)
    fit_calls = [c for c in fake_statsmodels.calls if "fit_kwargs" in c]
    assert len(fit_calls) == len(fm.UPGRADED_GRIDS["hw"])
    n_train = len(Y) - fm.TEST_MONTHS
    for c in fit_calls:
        assert len(c["endog"]) == n_train
        assert len(c["exog"]) == n_train


def test_champion_flow_over_upgraded_sarimax(fake_statsmodels):
    model, params, fc, score = fm.forecast_with_champion(Y, steps=3, exog=EXOG)
    assert model in ("hw", "laglin", "snaive")
    assert len(fc) == 3 and np.all(np.isfinite(fc))
    # the hw family must have been tuned through the fake library
    assert any(c["order"] is not None for c in fake_statsmodels.calls)


# ---------------------------------------------------- catboost slot

def test_catboost_dispatch_and_plumbing(fake_catboost):
    assert fm.slot_factory("laglin") is fm.CatBoostSlot
    assert fm.slot_grid("laglin") is fm.UPGRADED_GRIDS["laglin"]

    model = fm.CatBoostSlot(lag_features=3, iterations=200)
    model.fit(Y)
    call = fake_catboost.calls[-1]
    assert call == {
        "iterations": 200,
        "random_seed": 42,
        "verbose": 0,
        "X_shape": (len(Y) - 3, 3),
        "y_len": len(Y) - 3,
    }
    fc = model.predict(4)
    assert fc.shape == (4,)
    assert np.all(fc >= 0)


def test_catboost_tune_and_champion(fake_catboost):
    params, score = fm.tune_model("laglin", Y)
    assert params in fm.UPGRADED_GRIDS["laglin"]
    assert np.isfinite(score)
    res = fm.select_champion(Y)
    assert {r["model"] for r in res.leaderboard} == {"hw", "laglin", "snaive"}
    assert res.leaderboard[0]["rank"] == 1


# -------------------------------------------------------- torch slot

def test_lstm_dispatch_and_plumbing(monkeypatch):
    monkeypatch.setattr(fm, "HAVE_TORCH", True)
    assert fm.slot_factory("snaive") is fm.LSTMSlot
    assert fm.slot_grid("snaive") is fm.UPGRADED_GRIDS["snaive"]

    seen = {}

    def fake_fit_forecast(y, steps, lookback, hidden_size, epochs, batch_size):
        seen.update(
            y=np.asarray(y), steps=steps, lookback=lookback,
            hidden_size=hidden_size, epochs=epochs, batch_size=batch_size,
        )
        return np.arange(1.0, steps + 1)

    monkeypatch.setattr(fm, "_lstm_fit_forecast", fake_fit_forecast)
    model = fm.LSTMSlot(lookback=6, hidden_size=32, epochs=50, batch_size=8)
    fc = model.fit(Y).predict(3)
    np.testing.assert_array_equal(fc, [1.0, 2.0, 3.0])
    assert seen["steps"] == 3
    assert (seen["lookback"], seen["hidden_size"]) == (6, 32)
    assert (seen["epochs"], seen["batch_size"]) == (50, 8)
    np.testing.assert_array_equal(seen["y"], Y)

    params, score = fm.tune_model("snaive", Y)
    assert params in fm.UPGRADED_GRIDS["snaive"]
    assert np.isfinite(score)


# --------------------------------------- real-library tests (skipped
# here, executed wherever the libraries actually exist)

@pytest.mark.skipif(not fm.HAVE_STATSMODELS, reason="statsmodels not installed")
def test_real_sarimax_fits_and_forecasts():
    fc = fm.SarimaxSlot(order=(1, 1, 1), seasonal_order=(0, 1, 1, 12)).fit(
        Y, exog=EXOG
    ).predict(3, exog_future=np.zeros(3))
    assert fc.shape == (3,) and np.all(np.isfinite(fc)) and np.all(fc >= 0)


@pytest.mark.skipif(not fm.HAVE_CATBOOST, reason="catboost not installed")
def test_real_catboost_fits_and_forecasts():
    fc = fm.CatBoostSlot(lag_features=3, iterations=50).fit(Y).predict(3)
    assert fc.shape == (3,) and np.all(np.isfinite(fc)) and np.all(fc >= 0)


@pytest.mark.skipif(not fm.HAVE_TORCH, reason="torch not installed")
def test_real_lstm_fits_and_forecasts():
    fc = fm.LSTMSlot(lookback=6, hidden_size=16, epochs=10).fit(Y).predict(3)
    assert fc.shape == (3,) and np.all(np.isfinite(fc)) and np.all(fc >= 0)


# The engagement + quality contract: with a real library present,
# slot_factory must return the UPGRADED class (not the stand-in), and
# the upgraded model's holdout RMSE must match-or-beat the numpy
# stand-in within a 1.5× tolerance on the golden series — "the upgrade
# engaged and is at least as good" becomes self-verifying the day the
# environment allows the install, instead of an unverifiable claim.

def _holdout_rmse(model) -> float:
    y_train, y_test = Y[:-3], Y[-3:]
    fc = model.fit(y_train).predict(3)
    return fm.rmse(y_test, fc)


@pytest.mark.skipif(not fm.HAVE_STATSMODELS, reason="statsmodels not installed")
def test_upgraded_sarimax_engages_and_matches_numpy_golden():
    assert fm.slot_factory("hw") is fm.SarimaxSlot
    up = _holdout_rmse(fm.SarimaxSlot(order=(1, 1, 1), seasonal_order=(0, 1, 1, 12)))
    base = _holdout_rmse(fm.NumpySarimax(order=(1, 1, 1), seasonal_order=(0, 1, 1, 12)))
    assert up <= 1.5 * base + 1e-9, f"upgraded SARIMAX rmse {up} vs numpy {base}"


@pytest.mark.skipif(not fm.HAVE_CATBOOST, reason="catboost not installed")
def test_upgraded_catboost_engages_and_matches_numpy_golden():
    assert fm.slot_factory("laglin") is fm.CatBoostSlot
    up = _holdout_rmse(fm.CatBoostSlot(lag_features=3, iterations=100))
    base = _holdout_rmse(fm.NumpyGBDT(lags=3, n_trees=100))
    assert up <= 1.5 * base + 1e-9, f"upgraded CatBoost rmse {up} vs numpy {base}"


@pytest.mark.skipif(not fm.HAVE_TORCH, reason="torch not installed")
def test_upgraded_lstm_engages_and_matches_numpy_golden():
    assert fm.slot_factory("snaive") is fm.LSTMSlot
    up = _holdout_rmse(fm.LSTMSlot(lookback=6, hidden_size=16, epochs=60))
    base = _holdout_rmse(fm.NumpyLSTM(lookback=6, hidden_size=12, epochs=60))
    assert up <= 1.5 * base + 1e-9, f"upgraded LSTM rmse {up} vs numpy {base}"
