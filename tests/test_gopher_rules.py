"""txt_quality_gopher: the synthetic corpus exercises the word-count
and stop-word rules (179/500 pass at sf0.01 — measured, not vacuous),
but its single-line symbol-free text can never trip the symbol /
bullet / ellipsis / mean-word-length rules — plant each one and
oracle-replay the planted corpus so both engines agree rule by rule."""

from __future__ import annotations

import duckdb

from claim_analysis_engine_spark.operators.textops import (
    GOPHER_STOPS,
    txt_quality_gopher,
)
from claim_analysis_engine_spark.registry import registry
from tests.oracle_harness import compare


def _doc(words):
    return " ".join(words)


def _clean_words(n):
    # passes every rule: 60 plain words, mwl ~4.5, stop hits included
    base = [f"word{i:02d}" for i in range(n - 4)]
    return base + list(GOPHER_STOPS[:4])


def test_each_planted_violation_trips_exactly_its_rule(spark, tmp_path):
    clean = _clean_words(60)
    rows = [
        (0, _doc(clean), "en", "t", 0),                          # passes
        (1, _doc(clean[:20]), "en", "t", 0),                     # too few words
        (2, _doc(["a"] * 56 + list(GOPHER_STOPS[:4])), "en", "t", 0),  # mwl < 3
        (3, _doc(["#" + w for w in clean]), "en", "t", 0),       # symbols
        (4, _doc(["12345" if i % 2 else w
                  for i, w in enumerate(clean)]), "en", "t", 0),  # alpha < 0.8
        (5, _doc([w.replace("word", "left") for w in clean[:56]]),
         "en", "t", 0),                                          # no stop hits
        (6, "\n".join("- " + _doc(clean[i:i + 6])
                      for i in range(0, 60, 6)), "en", "t", 0),  # bullets
        (7, "\n".join(_doc(clean[i:i + 6]) + "..."
                      for i in range(0, 60, 6)), "en", "t", 0),  # ellipses
        (8, "", "en", "t", 0),                                   # empty: closed
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r.doc_id: r for r in txt_quality_gopher(spark, str(tmp_path)).collect()
    }
    assert got[0].passes_gopher, got[0]
    for d in range(1, 9):
        assert not got[d].passes_gopher, (d, got[d])
    # the measurement columns isolate WHICH rule fired
    assert got[1].n_words < 50
    assert got[2].mean_word_len < 3.0
    assert got[3].symbol_ratio > 0.1
    assert got[4].alpha_word_frac < 0.8
    assert got[5].n_stop_hits < 2
    assert got[6].bullet_frac > 0.9
    assert got[7].ellipsis_frac > 0.3
    assert got[8].n_words == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    try:
        op = registry()["txt_quality_gopher"]
        ok, msg = compare(
            op.query(spark, str(tmp_path)).toPandas(), con, op.oracle
        )
        assert ok, msg
    finally:
        con.close()
