"""Recall checks for the LSH-based near-dup operators: the oracle
parity gate proves algorithmic parity; these tests prove the
algorithms actually FIND the planted near-duplicates, against exact
all-pairs ground truth computed in DuckDB (test-only — the operators
themselves never do all-pairs)."""

from __future__ import annotations

import math

import pytest

from claim_analysis_engine_spark.operators.dedup_text import (
    dedup_embed_cosine,
    dedup_minhash_lsh,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.fixture(scope="module")
def exact_jaccard(duck):
    """(doc_a, doc_b) -> exact string-shingle Jaccard for every
    CO-SHINGLED pair at SF_ORACLE, shared by the three recall/precision
    tests (each used to recompute it: ~18 s per test with the naive
    all-pairs list_intersect; the inverted-index form runs ~1.5 s once
    — J = i / (|a| + |b| - i), and pairs sharing zero shingles have
    J = 0, which no consumer's threshold can reach)."""
    rows = duck.execute(
        """
        WITH sh AS (
          SELECT doc_id, list_distinct(list_transform(
                   generate_series(1, greatest(1, length(text) - 4)),
                   i -> substr(text, i, 5))) AS s
          FROM documents),
        ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        inter AS (
          SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT da, db, i * 1.0 / (len(sa.s) + len(sb.s) - i)
        FROM inter
        JOIN sh sa ON sa.doc_id = da
        JOIN sh sb ON sb.doc_id = db
        """
    ).fetchall()
    return {(a, b): j for a, b, j in rows}


def test_minhash_lsh_recall_at_high_jaccard(spark, exact_jaccard):
    truth = {p for p, j in exact_jaccard.items() if j >= 0.9}
    assert truth, "testdata should contain planted near-duplicates"
    found = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, SF_ORACLE).collect()
    }
    # at J ≥ 0.9 the any-of-4-bands hit probability is 1-(1-0.9^4)^4 ≈ 0.98
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(truth)} true pairs"


def test_embed_lsh_recall(spark, duck):
    truth = {
        (a, b)
        for a, b in duck.execute(
            """
            SELECT a.vec_id, b.vec_id
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
            """
        ).fetchall()
    }
    assert truth
    found = {
        (r.vec_a, r.vec_b) for r in dedup_embed_cosine(spark, SF_ORACLE).collect()
    }
    # 8 bands × 4 hyperplane bits: P(hit) at cos 0.45 is
    # 1-(1-(1-acos(0.45)/π)^4)^8 ≈ 0.79 — assert a loose floor
    p_bit = 1 - math.acos(0.45) / math.pi
    expected = 1 - (1 - p_bit**4) ** 8
    recall = len(truth & found) / len(truth)
    assert recall >= expected / 2, f"embed-LSH recall {recall:.2f}, expected ≈{expected:.2f}"


def test_simhash_pigeonhole_recall_is_exact(spark, duck):
    """Pigeonhole blocking is a GUARANTEE, not a probability: any pair
    within Hamming <= 3 differs in at most 3 of the 4 disjoint 8-bit
    blocks, so at least one block matches and the pair is a candidate.
    Recall vs exact all-pairs Hamming ground truth must be 1.0."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        HAMMING_T,
        _SIMHASH_SQL,
        _TOKENS_SQL,
        dedup_simhash,
    )

    truth = {
        (doc_id, keep_id, bool(is_dup))
        for doc_id, keep_id, is_dup in duck.execute(
            f"""
            WITH toks0 AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
            hashed AS (
              SELECT doc_id, list_transform(toks, t -> md5(t)) AS hashes
              FROM toks0
            ),
            sigs AS (SELECT doc_id, {_SIMHASH_SQL} AS sig FROM hashed),
            mins AS (
              SELECT b.doc_id, min(a.doc_id) AS keep_min
              FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.sig, b.sig)) <= {HAMMING_T}
              GROUP BY 1
            )
            SELECT s.doc_id, coalesce(m.keep_min, s.doc_id),
                   m.keep_min IS NOT NULL
            FROM sigs s LEFT JOIN mins m ON m.doc_id = s.doc_id
            """
        ).fetchall()
    }
    assert any(is_dup for _, _, is_dup in truth), (
        "testdata should contain simhash-near documents"
    )
    found = {
        (r.doc_id, r.keep_id, r.is_dup)
        for r in dedup_simhash(spark, SF_ORACLE).collect()
    }
    assert truth == found, (
        f"pigeonhole keep decisions must be exact vs the all-pairs "
        f"ground truth: missed {len(truth - found)}, "
        f"spurious {len(found - truth)}"
    )


def test_minhash_lsh_fast_recall_and_precision(spark, exact_jaccard):
    """The xxhash64 production variant has no DuckDB oracle (the hash
    is JVM-only), so assert correctness directly: every emitted pair's
    Jaccard equals the exact value and clears the threshold (precision
    1.0 by construction of the verify step), and recall at J >= 0.9
    matches the banding math, same floor as the md5 path."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        JACCARD_T,
        dedup_minhash_lsh_fast,
    )

    exact = {
        p: round(j, 4) for p, j in exact_jaccard.items() if j >= 0.8
    }
    found = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh_fast(spark, SF_ORACLE).collect()
    }
    assert found, "fast path should emit pairs on the planted near-dups"
    for pair, j in found.items():
        assert pair in exact, f"{pair} emitted but exact J < {JACCARD_T}"
        assert abs(j - exact[pair]) < 1e-6, f"{pair}: {j} != exact {exact[pair]}"
    high = {p for p, j in exact.items() if j >= 0.9}
    assert high
    recall = len(high & set(found)) / len(high)
    assert recall >= 0.9, f"fast-LSH recall {recall:.2f} over {len(high)} true pairs"


def test_mllib_hashed_jaccard_divergence_anchors_contract_slack(
    spark, exact_jaccard
):
    """The r11 ADVICE ask: dedup_lsh_fast_contract /
    dedup_minhash_mllib_contract relaxed their precision threshold by
    1e-3 to absorb hashed-shingle divergence — anchor that slack to the
    MEASURED quantity so it can't silently grow. The hashing-trick path
    (HashingTF at 2^18 features) is the only one with real divergence:
    measure max |emitted hashed-set J - exact string-shingle J| over
    every emitted pair and assert it sits two orders of magnitude
    inside the slack (documented ~3e-5; emitted values carry a round-6,
    so the measurable bound is divergence + 5e-7)."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        dedup_minhash_mllib,
    )

    found = dedup_minhash_mllib(spark, SF_ORACLE).collect()
    assert found
    # every emitted pair shares shingles, so it is in the co-shingled map
    worst = max(
        abs(r.jaccard - exact_jaccard[(r.doc_a, r.doc_b)]) for r in found
    )
    # the contracts' slack constant, and the measured anchor under it
    assert worst < 1e-3, f"divergence {worst:.2e} breaches the 1e-3 slack"
    assert worst < 1e-4, (
        f"measured hashed-J divergence {worst:.2e} grew past 1e-4 — "
        "the contracts' 1e-3 slack is no longer two orders of margin; "
        "re-measure before trusting the relaxed precision threshold"
    )


def test_simhash_fast_pigeonhole_recall_is_exact(spark):
    """The 64-bit xxhash64 production geometry: 4 disjoint 16-bit
    blocks, so a pair within Hamming <= 3 shares at least one block —
    the blocked keep decisions must EQUAL exact all-pairs ground truth
    computed over the same signatures (no oracle exists for xxhash64,
    so the signatures themselves are the trusted common input)."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        HAMMING_T,
        dedup_simhash_fast,
        simhash64_sigs,
    )

    sigs = simhash64_sigs(spark, SF_ORACLE)
    sigs.createOrReplaceTempView("_sh64_sigs")
    truth = {
        (r.doc_id, r.keep_id, r.is_dup)
        for r in spark.sql(
            f"""
            WITH mins AS (
              SELECT b.doc_id, min(a.doc_id) AS keep_min
              FROM _sh64_sigs a JOIN _sh64_sigs b ON a.doc_id < b.doc_id
              WHERE bit_count(a.sig ^ b.sig) <= {HAMMING_T}
              GROUP BY 1
            )
            SELECT s.doc_id, coalesce(m.keep_min, s.doc_id) AS keep_id,
                   m.keep_min IS NOT NULL AS is_dup
            FROM _sh64_sigs s LEFT JOIN mins m ON m.doc_id = s.doc_id
            """
        ).collect()
    }
    assert any(is_dup for _, _, is_dup in truth), (
        "testdata should contain simhash64-near documents"
    )
    found = {
        (r.doc_id, r.keep_id, r.is_dup)
        for r in dedup_simhash_fast(spark, SF_ORACLE).collect()
    }
    assert truth == found, (
        f"64-bit pigeonhole keep decisions must be exact: "
        f"missed {len(truth - found)}, spurious {len(found - truth)}"
    )


def test_cc_propagation_surfaces_cap_hit(spark):
    """A label-propagation run that stops at the iteration cap must say
    so: on a path graph needing ~diameter rounds, max_iters=1 returns
    converged=False (and partial labels); the default cap converges and
    returns True. dedup_cluster_cc forwards this flag as an
    oracle-checked output column."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        propagate_min_labels,
    )

    # path graph 10-20-30-40: min label needs 3 rounds to reach the end
    nodes = spark.createDataFrame(
        [(s, s) for s in (10, 20, 30, 40)], "sig long, label long"
    )
    half = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40)], "siga long, sigb long"
    )
    edges = half.unionByName(
        half.selectExpr("sigb AS siga", "siga AS sigb")
    )

    _, converged_capped = propagate_min_labels(nodes, edges, max_iters=1)
    assert converged_capped is False

    labels, converged = propagate_min_labels(nodes, edges)
    assert converged is True
    assert {(r.sig, r.label) for r in labels.collect()} == {
        (10, 10), (20, 10), (30, 10), (40, 10)
    }


def test_star_cc_converges_where_diameter_propagation_cannot(spark):
    """The separation that justifies the alternating-star variant: on a
    64-node PATH graph (diameter 63), min-label propagation needs
    ~diameter rounds and must blow its 20-round cap, while the
    large-star/small-star loop converges in O(log n) rounds — the
    chained-duplicate topology (A≈B≈C≈… across crawls) a 100 TB corpus
    actually produces."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        CC_MAX_ITERS,
        propagate_min_labels,
        star_components,
    )
    from pyspark.sql import functions as F

    n = 64
    assert n - 1 > CC_MAX_ITERS
    path = [(i, i + 1) for i in range(n - 1)]
    nodes = spark.createDataFrame(
        [(i, i) for i in range(n)], "sig bigint, label bigint"
    ).localCheckpoint()
    sym = path + [(b, a) for a, b in path]
    edges = spark.createDataFrame(
        sym, "siga bigint, sigb bigint"
    ).localCheckpoint()

    _labels, converged = propagate_min_labels(nodes, edges)
    assert not converged  # diameter-bound: the cap is genuinely hit

    star_edges = spark.createDataFrame(path, "u bigint, v bigint")
    assign, star_conv, rounds = star_components(star_edges)
    assert star_conv
    assert rounds <= 12, rounds  # O(log n), not O(diameter)
    roots = {r.u: r.root for r in assign.collect()}
    assert set(roots.values()) == {0}  # one component, min-id root


def test_star_cc_agrees_with_propagation_cc(spark):
    """Both CC implementations must emit identical (doc, root, size)
    clusterings over the real near-dup graph."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        dedup_cluster_cc,
        dedup_cluster_cc_star,
    )
    from tests.conftest import SF_SMALL

    a = {
        (r.doc_id, r.root_id, r.cluster_size)
        for r in dedup_cluster_cc(spark, SF_SMALL).collect()
    }
    b = {
        (r.doc_id, r.root_id, r.cluster_size)
        for r in dedup_cluster_cc_star(spark, SF_SMALL).collect()
    }
    assert a == b


def test_fuzzy_entity_join_resolves_typos_without_hot_blocks(spark):
    """Entity resolution quality pin: every resolved dirty variant must
    map back to its source customer (the planted typo hits the letter
    prefix, so the discriminative digit tail survives), unresolved
    records surface the -1 sentinel instead of dropping, and the
    blocking stays DF-pruned — the shared "Cus"/"ust" prefix grams
    (DF = |corpus|) must never act as block keys, or the join
    degenerates into one hot bucket."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        FUZZY_NO_MATCH,
        join_fuzzy_entity,
    )
    from tests.conftest import SF_SMALL

    rows = join_fuzzy_entity(spark, SF_SMALL).collect()
    assert len(rows) == 22  # every 7th of 150 customers
    resolved = [r for r in rows if r.matched_key != FUZZY_NO_MATCH]
    assert len(resolved) == 19
    # zero mismatches: resolution is exact wherever a rare gram exists
    assert all(r.matched_key == r.dirty_key for r in resolved)
    assert all(r.jaccard > 0.6 for r in resolved)
    # the unresolvable tails are the near-all-zero ids whose grams are
    # all above the DF threshold at this tiny corpus size
    assert sorted(r.dirty_key for r in rows if r.matched_key == FUZZY_NO_MATCH) == [0, 7, 14]


def test_containment_prefix_filter_recall_is_exact(spark, duck):
    """The prefix-filter guarantee: any (A, B) with containment ≥ 0.9
    shares at least one of A's ⌊0.1·|A|⌋+1 rarest shingles with B, so
    the op must surface EVERY doc that has a ≥-0.9 container — checked
    against exact all-pairs ground truth (test-only; the op never does
    all-pairs). Also pins the asymmetry: containment ground truth is
    directional, and the op reports the best container per CONTAINED
    doc."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        txt_containment_prefix,
    )

    # inverted-index form of the directional-containment truth
    # (c = |a ∩ b| / |a|; non-co-shingled pairs have c = 0, below any
    # 0.9 band) — the naive all-pairs list_intersect took ~20 s here
    truth = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            """
            WITH sh AS (
              SELECT doc_id, list_distinct(list_transform(
                       generate_series(1, greatest(1, length(text) - 4)),
                       i -> substr(text, i, 5))) AS s
              FROM documents),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT i.doc_a, i.doc_b, i.i * 1.0 / len(sa.s) AS c
              FROM inter i JOIN sh sa ON sa.doc_id = i.doc_a
            ),
            best AS (
              SELECT doc_a, doc_b, c,
                     row_number() OVER (PARTITION BY doc_a
                                        ORDER BY c DESC, doc_b) AS rn
              FROM pairs WHERE c >= 0.9
            )
            SELECT doc_a, doc_b, round(c, 4) FROM best WHERE rn = 1
            """
        ).fetchall()
    }
    got = {
        r["doc_id"]: (r["container_id"], float(r["containment"]))
        for r in txt_containment_prefix(spark, SF_ORACLE)
        .where("is_contained")
        .collect()
    }
    assert set(got) == set(truth), (
        "contained-doc sets differ: "
        f"missed={set(truth) - set(got)} extra={set(got) - set(truth)}"
    )
    for doc_id, (b, c) in truth.items():
        assert got[doc_id] == (b, pytest.approx(c, abs=1e-4)), doc_id
    assert truth, "ground truth is empty — the check is vacuous"


def test_containment_sparse_stats_golden(spark):
    """The Zipf-fixture instrument's whole point, pinned: on a
    realistic (Zipf-vocabulary) corpus the prefix filter's candidate
    set is ≪ n·(n−1) — 46 basis points here, vs ~9600 bp measured on
    the degenerate synthetic corpus — while recall of the 250 planted
    exact-containments stays 250/250 with zero false flags. The frozen
    RandomState makes every number exact."""
    from claim_analysis_engine_spark.operators.dedup_text import (
        txt_containment_sparse,
    )

    row = txt_containment_sparse(spark, SF_ORACLE).collect()[0].asDict()
    assert row == {
        "n_docs": 5000,
        "n_possible_pairs": 24995000,
        "n_candidate_pairs": 117164,
        "cand_share_bp": 46,
        "n_planted": 250,
        "n_recalled": 250,
        "n_flagged": 250,
    }, row


def test_containment_sparse_filter_lossless_on_zipf_subset(spark):
    """All-pairs ground truth on a 400-doc slice of the Zipf fixture
    (test-only brute force): every doc with a ≥-0.9 container must be
    flagged by the prefix-filter pipeline with the same best
    container — the losslessness guarantee, re-proven on the corpus
    shape where the filter actually prunes."""
    import duckdb
    import pandas as pd

    from claim_analysis_engine_spark.operators.dedup_text import (
        _containment_best,
        _containment_candidates,
        _shingles_col,
        _zipf_corpus,
    )

    docs, planted = _zipf_corpus()
    subset = docs[:400]
    pdf = pd.DataFrame(subset, columns=["doc_id", "text"])
    # inverted-index truth (see test_containment_prefix_filter_recall):
    # the naive all-pairs list_intersect form ran 66 s on this slice,
    # this form 1.7 s — identical 20 rows verified before the swap
    truth = {
        r[0]: (r[1], r[2])
        for r in duckdb.connect().execute(
            """
            WITH sh AS (
              SELECT doc_id, list_distinct(list_transform(
                       generate_series(1, greatest(1, length(text) - 4)),
                       i -> substr(text, i, 5))) AS s
              FROM pdf),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT i.doc_a, i.doc_b, i.i * 1.0 / len(sa.s) AS c
              FROM inter i JOIN sh sa ON sa.doc_id = i.doc_a
            ),
            best AS (
              SELECT doc_a, doc_b, c,
                     row_number() OVER (PARTITION BY doc_a
                                        ORDER BY c DESC, doc_b) AS rn
              FROM pairs WHERE c >= 0.9
            )
            SELECT doc_a, doc_b, round(c, 4) FROM best WHERE rn = 1
            """
        ).fetchall()
    }
    # the slice keeps 20 planted (contained, container) pairs intact
    assert len([p for p in planted if p[0] < 400 and p[1] < 400]) == 20
    assert len(truth) >= 20
    sh = (
        spark.createDataFrame(subset, "doc_id long, text string")
        .select("doc_id", _shingles_col().alias("sh"))
        .cache()
    )
    got = {
        r["doc_id"]: (r["container_id"], float(r["containment"]))
        for r in _containment_best(sh, _containment_candidates(sh))
        .where("is_contained")
        .collect()
    }
    assert set(got) == set(truth), (
        f"missed={set(truth) - set(got)} extra={set(got) - set(truth)}"
    )
    for doc_id, (b, c) in truth.items():
        assert got[doc_id] == (b, pytest.approx(c, abs=1e-4)), doc_id


def test_containment_candidate_scaling_curve(spark):
    """The dedup/containment family's scale claim MEASURED, not argued
    (round-10 verdict ask): candidate-count growth between N and 4N
    docs, pinned exactly by the frozen RandomState.

    (a) FIXED 20k vocabulary: 2,611 → 117,164 candidates for 1,250 →
    5,000 docs — 44.9× for 4× docs, SUPER-quadratic. That is a fixture
    property, not an algorithm property: holding the vocabulary fixed
    while the corpus grows raises every shingle's document frequency,
    and the prefix filter's candidates scale ~ Σ df². It documents why
    fixed-vocab synthetic corpora overstate candidate growth (the
    degenerate documents table being the extreme case).

    (b) Heaps-scaled (vocabulary grows with the corpus, as real text's
    does): 15,365 → 117,164 — 7.63× for 4× docs, strictly
    SUB-quadratic (< 16×). This is the regime a real growing corpus
    lives in; proportional vocab growth is CONSERVATIVE vs the
    sublinear Heaps exponent (~N^0.5) of natural text, so the
    production curve sits below this pinned one."""
    from claim_analysis_engine_spark.operators import dedup_text as dt

    def n_candidates(n_docs: int, vocab: int) -> int:
        docs, _planted = dt._zipf_corpus(n_docs, vocab)
        sh = (
            spark.createDataFrame(docs, "doc_id long, text string")
            .repartition(8)
            .select("doc_id", dt._shingles_col().alias("sh"))
        )
        return dt._containment_candidates(sh).count()

    big = n_candidates(5000, 20000)
    assert big == 117164  # the txt_containment_sparse golden's substrate
    fixed_small = n_candidates(1250, 20000)
    assert fixed_small == 2611
    heaps_small = n_candidates(1250, 5000)
    assert heaps_small == 15365

    heaps_ratio = big / heaps_small
    assert heaps_ratio < 16.0, (
        f"Heaps-scaled candidate growth went quadratic: {heaps_ratio:.2f}x"
    )
    assert big / fixed_small > 16.0, (
        "the fixed-vocab density effect vanished — the fixture premise "
        "changed; re-derive both goldens"
    )


def test_simhash64_bitsliced_fold_matches_per_bit_recount(spark):
    """r15 optimization guard: simhash64_sigs computes the per-bit
    majority votes with 16 SWAR lane folds (four 16-bit set-bit
    counters per long). Pin it byte-identical to an INDEPENDENT
    per-bit recount — the r14 formulation, one ±1 fold per bit —
    over the same token hashes, so a future fold/lane/shift bug
    cannot move signatures silently (the recall test alone would not
    catch it: op and ground truth share the signatures)."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.dedup_text import (
        SIMHASH64_BITS,
        simhash64_sigs,
    )
    from claim_analysis_engine_spark.tables import load
    from tests.conftest import SF_SMALL

    new = {(r.doc_id, r.sig) for r in simhash64_sigs(spark, SF_SMALL).collect()}

    toks = F.array_distinct(F.array_remove(F.split("text", " "), ""))
    hashed = load(spark, SF_SMALL, "documents").select(
        "doc_id", F.transform(toks, lambda t: F.xxhash64(t)).alias("hashes")
    )

    def vote(b: int) -> F.Column:
        return F.aggregate(
            "hashes",
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    terms = [
        F.when(
            vote(b) > 0,
            F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for b in range(SIMHASH64_BITS)
    ]
    ref = {
        (r.doc_id, r.sig)
        for r in hashed.select(
            "doc_id", sum(terms[1:], terms[0]).alias("sig")
        ).collect()
    }
    assert new == ref, (
        f"bit-sliced signatures drifted from the per-bit recount: "
        f"{len(ref - new)} missing, {len(new - ref)} spurious"
    )
