"""Planted-corpus semantics for the substring-dedup pair
(dedup_span_extract / corpus_remove_dup_spans): exact detection at the
SPAN_GRAM boundary, maximal-island extents, cross-doc-only duplication,
canonical-first-occurrence removal, and order-preserving reconstruction
— the guarantees the DuckDB oracle alone can't isolate (it replays the
same algorithm; THESE tests pin the algorithm to the spec)."""

from __future__ import annotations

import hashlib

from claim_analysis_engine_spark.operators.dedup_text import (
    SPAN_GRAM,
    corpus_remove_dup_spans,
    dedup_span_extract,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _u(doc: int, n: int) -> list[str]:
    """n globally-unique filler tokens for doc `doc` — unique words can
    never form a cross-doc duplicated gram."""
    return [f"u{doc}x{i}" for i in range(n)]


def _write_docs(spark, tmp_path, texts: dict[int, list[str]]) -> str:
    rows = [
        (i, " ".join(toks), "en", "test", len(" ".join(toks)))
        for i, toks in texts.items()
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


SHARED20 = [f"s{i}" for i in range(20)]  # the planted 20-token run


def test_span_extract_finds_maximal_run_with_exact_extents(spark, tmp_path):
    # doc 1: 5 filler + run + 4 filler   -> span at positions 6..25
    # doc 2: 2 filler + run + 7 filler   -> span at positions 3..22
    sf = _write_docs(
        spark,
        tmp_path,
        {
            1: _u(1, 5) + SHARED20 + [f"u1y{i}" for i in range(4)],
            2: _u(2, 2) + SHARED20 + [f"u2y{i}" for i in range(7)],
        },
    )
    spans = {
        r["doc_id"]: r
        for r in dedup_span_extract(spark, sf).collect()
    }
    assert set(spans) == {1, 2}
    assert (spans[1]["span_start"], spans[1]["span_end"]) == (6, 25)
    assert (spans[2]["span_start"], spans[2]["span_end"]) == (3, 22)
    for r in spans.values():
        assert r["span_tokens"] == 20
        # a run of length R contributes R - SPAN_GRAM + 1 duplicated grams
        assert r["n_dup_grams"] == 20 - SPAN_GRAM + 1
        assert r["span_md5"] == _md5(" ".join(SHARED20))


def test_span_extract_min_length_boundary(spark, tmp_path):
    at = [f"a{i}" for i in range(SPAN_GRAM)]      # exactly SPAN_GRAM: found
    below = [f"b{i}" for i in range(SPAN_GRAM - 1)]  # one short: invisible
    sf = _write_docs(
        spark,
        tmp_path,
        {
            1: at + _u(1, 6) + below,
            2: below + _u(2, 6) + at,
        },
    )
    rows = dedup_span_extract(spark, sf).collect()
    assert len(rows) == 2  # one span per doc, only the SPAN_GRAM-long run
    assert all(r["span_tokens"] == SPAN_GRAM for r in rows)
    assert all(r["span_md5"] == _md5(" ".join(at)) for r in rows)


def test_span_extract_requires_cross_doc_duplication(spark, tmp_path):
    rep = [f"r{i}" for i in range(SPAN_GRAM)]
    # the run repeats INSIDE doc 1 but appears in no other doc
    sf = _write_docs(
        spark,
        tmp_path,
        {1: rep + _u(1, 3) + rep, 2: _u(2, 30)},
    )
    assert dedup_span_extract(spark, sf).count() == 0


def test_remove_keeps_canonical_first_occurrence_only(spark, tmp_path):
    d1 = _u(1, 5) + SHARED20 + [f"u1y{i}" for i in range(4)]
    d2 = _u(2, 2) + SHARED20 + [f"u2y{i}" for i in range(7)]
    sf = _write_docs(spark, tmp_path, {1: d1, 2: d2})
    out = {r["doc_id"]: r for r in corpus_remove_dup_spans(spark, sf).collect()}
    # doc 1 owns the canonical occurrence (min doc_id) — untouched
    assert out[1]["n_tokens_before"] == len(d1)
    assert out[1]["n_tokens_kept"] == len(d1)
    assert out[1]["clean_md5"] == _md5(" ".join(d1))
    # doc 2 loses exactly the 20-token span, order preserved
    expect2 = _u(2, 2) + [f"u2y{i}" for i in range(7)]
    assert out[2]["n_tokens_before"] == len(d2)
    assert out[2]["n_tokens_kept"] == len(expect2)
    assert out[2]["clean_md5"] == _md5(" ".join(expect2))


def test_remove_fully_duplicated_doc_empties_to_md5_of_empty(spark, tmp_path):
    body = [f"c{i}" for i in range(12)]
    sf = _write_docs(
        spark,
        tmp_path,
        {1: _u(1, 3) + body + _u(1, 3), 2: body},  # doc 2 IS the span
    )
    out = {r["doc_id"]: r for r in corpus_remove_dup_spans(spark, sf).collect()}
    assert out[2]["n_tokens_kept"] == 0
    assert out[2]["clean_md5"] == _md5("")
    assert out[1]["n_tokens_kept"] == out[1]["n_tokens_before"]


def test_ep13_gate_drops_fully_deduped_docs_and_accounts_shaved_tokens(
    spark, tmp_path
):
    """Composition sensitivity for the curation capstone: a doc whose
    content is entirely a duplicated span survives the rewrite as an
    empty doc and must be GATED OUT, while its tokens count as shaved
    only for docs that survive."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        EP13_MIN_TOKENS,
        ep13_span_curation_e2e,
    )

    body = [f"c{i}" for i in range(30)]
    keeper = _u(1, EP13_MIN_TOKENS) + body  # survives, owns the span
    dup_doc = body                          # becomes empty -> gated out
    trimmed = _u(3, EP13_MIN_TOKENS + 5) + body  # loses 30, survives
    sf = _write_docs(spark, tmp_path, {1: keeper, 2: dup_doc, 3: trimmed})
    rows = {r["split"]: r for r in ep13_span_curation_e2e(spark, sf).collect()}
    assert sum(r["n_docs"] for r in rows.values()) == 2  # doc 2 gated
    assert sum(r["tokens_total"] for r in rows.values()) == len(keeper) + (
        len(trimmed) - 30
    )
    assert sum(r["tokens_shaved"] for r in rows.values()) == 30


def test_dup_span_frac_scores_exact_coverage(spark, tmp_path):
    from claim_analysis_engine_spark.operators.dedup_text import (
        txt_dup_span_frac,
    )

    d1 = _u(1, 20) + SHARED20  # 40 tokens, 20 covered -> 5000 bp
    d2 = SHARED20 + _u(2, 60)  # 80 tokens, 20 covered -> 2500 bp
    d3 = _u(3, 10)             # clean -> 0 bp
    sf = _write_docs(spark, tmp_path, {1: d1, 2: d2, 3: d3})
    out = {r["doc_id"]: r for r in txt_dup_span_frac(spark, sf).collect()}
    assert out[1]["dup_frac_bp"] == 5000 and out[1]["n_spans"] == 1
    assert out[2]["dup_frac_bp"] == 2500 and out[2]["dup_tokens"] == 20
    assert out[3]["dup_frac_bp"] == 0 and out[3]["n_spans"] == 0


def test_span_discovery_scales_linearly_across_sf(spark):
    """Scaling instrument: duplicated-span discovery must grow ~linearly
    with corpus size (the gram groupBy admits no pair blow-up). The
    driver corpus is 10x between sf0.01 and sf0.1; pin the span count
    ratio inside a generous linear band (a quadratic candidate path
    would blow far past it)."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        dedup_span_extract,
    )

    n_small = dedup_span_extract(spark, "/root/testdata/sf0.01").count()
    n_large = dedup_span_extract(spark, "/root/testdata/sf0.1").count()
    assert n_small > 0
    ratio = n_large / n_small
    assert 5 <= ratio <= 20, (n_small, n_large)


def test_incremental_span_dedup_is_asymmetric(spark, tmp_path):
    """Only new-vs-OLD duplication is flagged: new-vs-new and
    old-vs-old runs must not appear (the arriving-crawl contract)."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        SPAN_INC_MOD,
        dedup_span_incremental,
    )

    old_run = [f"o{i}" for i in range(12)]
    new_run = [f"n{i}" for i in range(12)]
    docs = {
        1: _u(1, 4) + old_run,            # old
        2: old_run + _u(2, 4),            # old (old-vs-old: ignored)
        SPAN_INC_MOD: _u(5, 3) + old_run + new_run,       # new
        2 * SPAN_INC_MOD: new_run + _u(10, 6),            # new
    }
    sf = _write_docs(spark, tmp_path, docs)
    out = dedup_span_incremental(spark, sf).collect()
    # exactly ONE span: doc 5's copy of the old run; the new-vs-new
    # run and the old docs never emit
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == SPAN_INC_MOD
    assert (r["span_start"], r["span_end"]) == (4, 15)
    assert r["span_md5"] == _md5(" ".join(old_run))


# ---- independent pure-Python twin + hypothesis agreement (the
# test_bpe.py verification form: two implementations, one spec) ----

def _ref_spans(texts: dict[int, list[str]]):
    """Independent span extraction: gram sets + island merging in
    plain Python — no shared code with the Spark op."""
    from claim_analysis_engine_spark.operators.dedup_text import SPAN_GRAM

    grams: dict[tuple, set] = {}
    for d, toks in texts.items():
        for i in range(len(toks) - SPAN_GRAM + 1):
            grams.setdefault(tuple(toks[i : i + SPAN_GRAM]), set()).add(d)
    dup = {g for g, s in grams.items() if len(s) >= 2}
    out: dict[int, list[tuple[int, int]]] = {}
    for d, toks in texts.items():
        runs: list[list[int]] = []
        for i in range(len(toks) - SPAN_GRAM + 1):
            if tuple(toks[i : i + SPAN_GRAM]) not in dup:
                continue
            p = i + 1
            if runs and p == runs[-1][1] + 1:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        out[d] = [(s, e + SPAN_GRAM - 1) for s, e in runs]
    return out


def _ref_remove(texts: dict[int, list[str]]):
    spans = _ref_spans(texts)
    flat = []  # (content, doc, start, end)
    for d, ss in spans.items():
        for s, e in ss:
            flat.append((" ".join(texts[d][s - 1 : e]), d, s, e))
    removable: dict[int, list[tuple[int, int]]] = {}
    seen_first: dict[str, tuple[int, int]] = {}
    for content, d, s, e in sorted(flat, key=lambda t: (t[0], t[1], t[2])):
        if content not in seen_first:
            seen_first[content] = (d, s)
        else:
            removable.setdefault(d, []).append((s, e))
    out = {}
    for d, toks in texts.items():
        rem = removable.get(d, [])
        kept = [
            w
            for i, w in enumerate(toks, start=1)
            if not any(s <= i <= e for s, e in rem)
        ]
        out[d] = (len(toks), len(kept), _md5(" ".join(kept)))
    return out


def test_span_ops_agree_with_independent_twin_on_random_corpora(
    spark, tmp_path
):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from claim_analysis_engine_spark.operators.dedup_text import (
        corpus_remove_dup_spans,
        dedup_span_extract,
    )

    doc_strategy = st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=0, max_size=28
    )
    corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=5)

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(corpus=corpus_strategy)
    def run(corpus):
        counter[0] += 1
        texts = {i + 1: toks for i, toks in enumerate(corpus)}
        sf = _write_docs(
            spark, f"{tmp_path}/c{counter[0]}", texts
        )
        got_spans = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in dedup_span_extract(spark, sf).collect()
        }
        want_spans = {
            (d, s, e) for d, ss in _ref_spans(texts).items() for s, e in ss
        }
        assert got_spans == want_spans
        got_rw = {
            r["doc_id"]: (
                r["n_tokens_before"],
                r["n_tokens_kept"],
                r["clean_md5"],
            )
            for r in corpus_remove_dup_spans(spark, sf).collect()
        }
        assert got_rw == _ref_remove(texts)

    run()
