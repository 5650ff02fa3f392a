"""Freeze the forecast-based warning thresholds (ml_warning_marking).

The reference DESIGNS this scanner (docs/project_master.md §2.2:
warning level from forecast slope + ratio to historical max;
docs/milestone.md Phase 4 "Warning Marking") but ships no code and no
thresholds; the levels asserted here are this engine's declared
concretization (tsforecast.WARN_RATIO_RED/_YELLOW). Any change to the
thresholds, the champion machinery, or the model family must re-derive
these goldens deliberately."""

from __future__ import annotations

import math

import numpy as np

from claim_analysis_engine_spark.operators.tsforecast import (
    warning_from_forecast,
)


def test_level2_requires_peak_and_rise():
    champion, slope, ratio, level = warning_from_forecast(np.arange(1.0, 25.0))
    assert (champion, slope, ratio, level) == ("laglin", 1.0, 1.125, 2)


def test_level1_flat_at_historic_level():
    # flat series: forecast sits AT the max (ratio 1.0) but isn't
    # rising — yellow, not red
    champion, slope, ratio, level = warning_from_forecast(
        np.array([5.0] * 12)
    )
    assert champion == "hw"
    assert ratio == 1.0
    assert slope <= 0
    assert level == 1


def test_level1_sawtooth_rising_but_far_from_peak():
    # a 1..12 sawtooth: the champion continues the season from the
    # bottom (ratio 0.25) but the forecast rises — slope alone is
    # enough for yellow
    y = np.array(list(range(1, 13)) * 2, dtype=float)
    champion, slope, ratio, level = warning_from_forecast(y)
    assert (champion, slope, ratio, level) == ("snaive", 1.0, 0.25, 1)


def test_level0_decaying_series():
    y = np.array([20, 18, 16, 14, 12, 10, 8, 6, 4, 2, 1, 1], dtype=float)
    champion, slope, ratio, level = warning_from_forecast(y)
    assert level == 0
    assert slope <= 0
    assert ratio < 0.7


def test_seasonal_stable_stays_yellow():
    y = np.array([10 + 5 * math.sin(2 * math.pi * i / 12) for i in range(36)])
    champion, slope, ratio, level = warning_from_forecast(y)
    assert (champion, level) == ("hw", 1)
    assert 0.7 <= ratio < 1.0
