"""Unit tests for the numpy forecasting family: each model must (a) be
deterministic, (b) recover the signal class it models, (c) clip at
zero; the tuner/champion must rank by test RMSE with stable ties."""

from __future__ import annotations

import numpy as np
import pytest

from claim_analysis_engine_spark import forecast_models as fm


def test_temporal_split_last_three():
    y = np.arange(10.0)
    train, test = fm.temporal_split(y)
    assert list(test) == [7.0, 8.0, 9.0]
    assert len(train) == 7


def test_confidence_interval_clips_at_zero():
    lo, hi = fm.confidence_interval(np.array([1.0, 10.0]), model_rmse=2.0)
    assert lo[0] == 0.0  # 1 - 3.92 clipped
    assert hi[0] == pytest.approx(1.0 + 1.96 * 2.0)


def test_holtwinters_tracks_trend_and_season():
    # strong seasonal pattern + slope: HW should forecast near the
    # next season's values
    t = np.arange(48)
    y = 10 + 0.5 * t + 5 * np.sin(2 * np.pi * t / 12)
    model = fm.HoltWinters(alpha=0.5, beta=0.1, gamma=0.1).fit(y)
    fc = model.predict(3)
    truth = 10 + 0.5 * (t[-1] + np.arange(1, 4)) + 5 * np.sin(
        2 * np.pi * (t[-1] + np.arange(1, 4)) / 12
    )
    assert np.allclose(fc, truth, atol=3.0)


def test_laglinear_recovers_ar_process():
    # y_t = 0.5 y_{t-1} + 4 exactly → OLS must recover it and predict
    # the fixed-point trajectory
    y = [8.0]
    for _ in range(40):
        y.append(0.5 * y[-1] + 4)
    model = fm.LagLinear(lags=2).fit(np.array(y))
    fc = model.predict(3)
    expect = [0.5 * y[-1] + 4]
    expect.append(0.5 * expect[-1] + 4)
    expect.append(0.5 * expect[-1] + 4)
    assert np.allclose(fc, expect, atol=1e-6)


def test_snaive_uses_last_season():
    y = np.array([1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12] * 3)
    model = fm.SeasonalNaiveDrift(drift_weight=0.0).fit(y)
    assert list(model.predict(3)) == [1.0, 2.0, 3.0]


def test_predictions_never_negative():
    y = np.array([3.0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0] * 3)
    for name, cls in fm._FACTORY.items():
        fc = cls().fit(y).predict(6)
        assert (fc >= 0).all(), name


def test_champion_is_deterministic_and_ranked():
    rng = np.random.RandomState(42)
    y = 20 + 3 * np.sin(2 * np.pi * np.arange(60) / 12) + rng.normal(0, 1, 60)
    a = fm.select_champion(y)
    b = fm.select_champion(y)
    assert a.champion == b.champion
    assert [r["rank"] for r in a.leaderboard] == [1, 2, 3]
    assert a.leaderboard[0]["rmse"] <= a.leaderboard[-1]["rmse"]


def test_persist_round_trip(tmp_path):
    payload = {"model": "hw", "params": {"alpha": 0.5}}
    fm.save_champion(str(tmp_path), "PLANT_A", "MAJOR_P", payload)
    assert fm.load_champion(str(tmp_path), "PLANT_A", "MAJOR_P") == payload
    assert fm.load_champion(str(tmp_path), "NOPE", "X") is None
