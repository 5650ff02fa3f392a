"""corpus_bpe_train golden check: the distributed merge table must be
IDENTICAL to an independent pure-Python BATCHED-BPE implementation run
on the same word frequencies (per round: rank pairs count-desc then
lexicographic, accept up to BPE_BATCH pairwise-non-interacting merges
from the top-BPE_CAND_WINDOW candidates, apply them all, refresh).
Byte-determinism across two Spark runs follows from the same
comparison."""

from __future__ import annotations

from collections import Counter

import duckdb

from claim_analysis_engine_spark.operators.pipeline_ops import (
    BPE_BATCH,
    BPE_CAND_WINDOW,
    BPE_MERGES,
    BPE_MIN_PAIR,
    corpus_bpe_train,
)
from tests.conftest import SF_SMALL


def _apply_merge(sym: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _python_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple]:
    """Batched BPE, the engine's exact algorithm: per round, accept up
    to BPE_BATCH symbol-disjoint merges from the top-BPE_CAND_WINDOW
    ranked pairs; disjointness (symbols AND merged tokens) keeps every
    recorded count exact at application time."""
    segs = {w: list(w) for w in word_freqs}
    merges: list[tuple] = []
    while len(merges) < n_merges:
        counts: Counter = Counter()
        for w, sym in segs.items():
            f = word_freqs[w]
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += f
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        ranked = ranked[:BPE_CAND_WINDOW]
        accepted, used = [], set()
        for (a, b), c in ranked:
            if c < BPE_MIN_PAIR or len(merges) + len(accepted) >= n_merges:
                break
            if len(accepted) >= BPE_BATCH:
                break
            if a in used or b in used or (a + b) in used:
                continue
            accepted.append((a, b, c))
            used.update((a, b, a + b))
        if not accepted:
            break
        for a, b, c in accepted:
            merges.append((len(merges) + 1, a, b, a + b, c))
            for w, sym in segs.items():
                segs[w] = _apply_merge(sym, a, b)
    return merges


def test_bpe_merge_table_matches_pure_python_reference(spark):
    freqs = dict(
        duckdb.query(
            f"""
            SELECT w, count(*) FROM (
              SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM '{SF_SMALL}/documents.parquet') GROUP BY 1
            """
        ).fetchall()
    )
    expected = _python_bpe(freqs, BPE_MERGES)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in corpus_bpe_train(spark, SF_SMALL).collect()
    ]
    assert got == expected
    assert len(got) >= 10, "corpus too degenerate for a meaningful check"


def _python_encode(segs_word: list[str], merges: list[tuple]) -> list[str]:
    """Apply the merge list in rank order, greedy left-to-right —
    the same semantics as the engine's array fold."""
    sym = list(segs_word)
    for _rank, a, b, _ab, _c in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_encode_counts_match_pure_python_reference(spark):
    from claim_analysis_engine_spark.operators.pipeline_ops import (
        corpus_bpe_encode,
    )

    freqs = dict(
        duckdb.query(
            f"""
            SELECT w, count(*) FROM (
              SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM '{SF_SMALL}/documents.parquet') GROUP BY 1
            """
        ).fetchall()
    )
    merges = _python_bpe(freqs, BPE_MERGES)
    tok_of = {w: len(_python_encode(list(w), merges)) for w in freqs}

    expected = {}
    for doc_id, text in duckdb.query(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall():
        words = [w for w in text.split(" ") if w]
        expected[doc_id] = (
            len(words),
            sum(tok_of[w] for w in words),
            sum(len(w) for w in words),
        )

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars"])
        for r in corpus_bpe_encode(spark, SF_SMALL).collect()
    }
    assert got == expected
    # encoding must actually compress: most docs save vs char-level
    rows = corpus_bpe_encode(spark, SF_SMALL).collect()
    assert sum(1 for r in rows if r["saving_bp"] > 0) > len(rows) * 0.9


def test_roundtrip_contract_flips_on_a_corrupted_fold(spark, monkeypatch):
    """The round-trip contract's failure mode is not a bad merge PAIR
    (the fold constructs a+b by design) but a broken FOLD — one that
    drops or reorders symbols. Plant exactly that: wrap _bpe_segment to
    truncate the symbol array of multi-symbol words, and both the
    word-level and doc-level reconstruction booleans must flip."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators import pipeline_ops as po

    real_segment = po._bpe_segment

    def broken_segment(vocab, merges):
        seg = real_segment(vocab, merges)
        return seg.select(
            "w",
            F.when(
                F.size("sym") >= 2, F.slice("sym", 1, F.size("sym") - 1)
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )

    healthy = po.corpus_bpe_roundtrip_contract(spark, SF_SMALL).first()
    assert healthy["all_words_reconstruct"] and healthy["all_docs_reconstruct"]
    assert healthy["words_nonempty"] and healthy["n_docs"] > 0

    monkeypatch.setattr(po, "_bpe_segment", broken_segment)
    bad = po.corpus_bpe_roundtrip_contract(spark, SF_SMALL).first()
    assert not bad["all_words_reconstruct"], "dropped symbol went unnoticed"
    assert not bad["all_docs_reconstruct"], "doc reassembly missed the drop"
