"""Golden-document test for the P6 rule engine: hand-built tree /
trailing-count / settings fixtures through compose_alerts and the JSON
doc sink must produce exactly the expected alerts.json documents —
including grade filtering, rule thresholds, warning levels, and the
skip of unconfigured plants."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

from claim_analysis_engine_spark.operators.rule_engine import (
    _DOC_SCHEMA,
    compose_alerts,
    load_settings,
)


def test_compose_alerts_golden_docs(spark):
    tree = spark.createDataFrame(
        [
            # tree-flagged red, also over rule threshold -> both, level 2
            ("F", "1-URGENT", "중대", "🔴", 92, "⚡돌발감지(희소유형 돌발 발생)"),
            # quiet tree, over threshold -> rule-only, level 1
            ("F", "5-LOW", "일반", "⚪", 0, "정상범주"),
            # tree yellow, under threshold -> tree-only, level 1
            ("O", "2-HIGH", "중대", "🟡", 55, "📊추세이탈(평균 대비 급증)"),
            # quiet and under threshold -> no alert
            ("O", "1-URGENT", "중대", "", 0, "발생 없음"),
            # grade not in plant O's presets -> filtered out even if loud
            ("O", "5-LOW", "일반", "🔴", 99, "📈급증감지(연속 상승 모멘텀)"),
            # plant P has no preset -> never emitted
            ("P", "1-URGENT", "중대", "🔴", 100, "초기급증(상승세 가속)"),
        ],
        "status string, priority string, grade string, risk_status string, "
        "score int, reason string",
    )
    trail = spark.createDataFrame(
        [
            ("F", "1-URGENT", 9),
            ("F", "5-LOW", 7),
            ("O", "2-HIGH", 3),
            ("O", "1-URGENT", 2),
            ("O", "5-LOW", 50),
            ("P", "1-URGENT", 50),
        ],
        "status string, priority string, trailing_count bigint",
    )
    settings_dir = tempfile.mkdtemp(prefix="cae_test_p6_settings_")
    spark.createDataFrame(
        [
            {"plant": "F", "filter_grade": ["중대", "일반"], "min_count": 5},
            {"plant": "O", "filter_grade": ["중대"], "min_count": 20},
        ]
    ).write.mode("overwrite").json(settings_dir)
    settings = load_settings(spark, settings_dir)

    docs = compose_alerts(tree, trail, settings, as_of="2026-08-13")
    out = tempfile.mkdtemp(prefix="cae_test_p6_alerts_")
    docs.write.mode("overwrite").json(out)

    # golden compare on the WRITTEN artifact
    raw_docs = []
    for f in Path(out).glob("part-*.json"):
        for line in f.read_text().splitlines():
            raw_docs.append(json.loads(line))
    by_plant = {d["plant"]: d for d in sorted(raw_docs, key=lambda d: d["plant"])}

    assert set(by_plant) == {"F", "O"}  # plant P skipped (no preset)
    assert all(d["as_of"] == "2026-08-13" for d in by_plant.values())

    f_doc = by_plant["F"]
    assert f_doc["n_alerts"] == 2
    assert f_doc["alerts"] == [
        {
            "priority": "1-URGENT",
            "grade": "중대",
            "risk_status": "🔴",
            "score": 92,
            "reason": "⚡돌발감지(희소유형 돌발 발생)",
            "trailing_count": 9,
            "rule_hit": True,
            "warning_level": 2,
            "alert_source": "both",
        },
        {
            "priority": "5-LOW",
            "grade": "일반",
            "risk_status": "⚪",
            "score": 0,
            "reason": "정상범주",
            "trailing_count": 7,
            "rule_hit": True,
            "warning_level": 1,
            "alert_source": "rule",
        },
    ]

    o_doc = by_plant["O"]
    assert o_doc["n_alerts"] == 1
    assert o_doc["alerts"][0]["alert_source"] == "tree"
    assert o_doc["alerts"][0]["warning_level"] == 1
    assert o_doc["alerts"][0]["rule_hit"] is False

    # read-back through the published schema flattens losslessly
    back = spark.read.schema(_DOC_SCHEMA).json(out)
    assert back.count() == 2
    assert back.selectExpr("sum(n_alerts)").collect()[0][0] == 3
