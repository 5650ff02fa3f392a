"""Multimodal-column handling for training-data pipelines: opaque
binary payloads with typed metadata, deterministic decode stubs behind
`mapInPandas` (real Arrow plumbing, fake decoder — the image/audio
libraries are not in this environment), frame sampling, and the
document⋈embedding assembly join.

The `documents.text` column stands in for the binary payload
(`encode(text, 'UTF-8')` → the opaque blob); at 100 TB the same
operators run over real image/audio bytes — only the decode stub's
body changes (swap the md5-derived fake for PIL/ffmpeg inside the
same mapInPandas signature).

Scale notes: blob metadata is per-row column math; the decode stub is
Arrow-batched Python with a fixed output schema (no shuffle — runs
wherever the scan runs); the assembly join is a 1:1 key join that
AQE plans as broadcast when one side is small.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load, spread_scan

REG = OpRegistry()

N_FRAMES = 8


# --------------------------------------------------------- mm_blob_meta

@REG.op(
    "mm_blob_meta",
    oracle="""
    -- DuckDB's md5/substring are VARCHAR-only: for UTF-8 payloads
    -- md5(text) is byte-identical to md5 over the encoded blob, and
    -- the 4-byte magic prefix re-encodes the first 4 characters
    SELECT d.doc_id, d.lang, d.source,
           octet_length(encode(d.text)) AS n_bytes,
           md5(d.text) AS blob_md5,
           lower(hex(encode(substring(d.text, 1, 4)))) AS magic_prefix,
           e.label, len(e.embedding) AS emb_dim
    FROM documents d
    LEFT JOIN embeddings e ON e.vec_id = d.doc_id
    """,
)
def mm_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata profile: byte length, content hash, and
    magic-byte prefix of the payload, joined 1:1 with the embedding
    row's typed metadata — the schema pattern for multimodal lakehouse
    tables (binary column + typed sidecar columns)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.encode("text", "UTF-8").alias("blob")
    )
    e = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        "label",
        F.size("embedding").alias("emb_dim"),
    )
    return d.join(e, "doc_id", "left").select(
        "doc_id",
        "lang",
        "source",
        F.octet_length("blob").alias("n_bytes"),
        F.md5("blob").alias("blob_md5"),
        F.lower(F.hex(F.substring("blob", 1, 4))).alias("magic_prefix"),
        "label",
        "emb_dim",
    )


# ------------------------------------------------------- mm_decode_stub

_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, mean_intensity double"
)


def _fake_decode(blob: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image/video decoder. A real
    deployment replaces THIS function body (PIL / ffmpeg / torchcodec)
    — the mapInPandas plumbing, schema and batch shape stay identical.
    Raises NotImplementedError for payloads that would need a real
    codec (none in the synthetic corpus)."""
    if blob[:4] in (b"\x89PNG", b"RIFF", b"\x00\x00\x00\x1c"):
        raise NotImplementedError("real codecs are not available in this environment")
    h = hashlib.md5(blob).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 + h[2] % 16
    mean_intensity = round(sum(h[3:11]) / (8 * 255.0), 6)
    return width, height, n_frames, mean_intensity


@REG.op("mm_decode_stub")  # Python decode stage — rows-only check
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract stage over binary payloads via
    `mapInPandas`: Arrow-batched, fixed output schema, no shuffle —
    the stage runs wherever the scan runs and scales with input
    splits. The decoder itself is a deterministic fake (see
    _fake_decode); tests/test_multimodal.py pins its determinism and
    batch behavior."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, nf, mi = _fake_decode(bytes(blob))
                out.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "mean_intensity": mi,
                    }
                )
            yield pd.DataFrame(out)

    return d.mapInPandas(decode, _DECODE_SCHEMA)


# ----------------------------------------------------- mm_decode_contract

@REG.op(
    "mm_decode_contract",
    oracle="""
    WITH hx AS (
      SELECT doc_id, md5(text) AS hh FROM documents
    ), b AS (
      SELECT doc_id,
             list_transform(range(0, 11), k ->
               (strpos('0123456789abcdef', substr(hh, 2 * k + 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hh, 2 * k + 2, 1)) - 1)
             ) AS h
      FROM hx
    )
    SELECT doc_id,
           CAST(16 + h[1] % 240 AS INT) AS width,
           CAST(16 + h[2] % 240 AS INT) AS height,
           CAST(1 + h[3] % 16 AS INT) AS n_frames,
           round((h[4] + h[5] + h[6] + h[7] + h[8] + h[9] + h[10] + h[11])
                 / (8 * 255.0), 6) AS mean_intensity
    FROM b
    """,
)
def mm_decode_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL value twin for the decode stage (the strongest form the
    contract campaign produces): because the stand-in decoder derives
    every output field from md5(payload bytes) (_fake_decode), and
    DuckDB can compute md5 over the same UTF-8 bytes and re-derive the
    digest bytes by hex-digit arithmetic, the ENTIRE mm_decode_stub
    output is SQL-reproducible per document. The hash gate therefore
    certifies the mapInPandas plumbing end-to-end: byte fidelity of
    the binary column through the Arrow boundary (one flipped or
    truncated payload byte flips that doc's md5 and all four fields),
    exactly one output row per document (row-count compare), batch
    iteration that neither drops nor duplicates tail batches, and the
    exact width/height/frames/intensity arithmetic.

    When a real codec replaces _fake_decode, this op's oracle is
    DELIBERATELY retired to shape-bound booleans (dimensions within
    container limits, intensity in [0,1], frame count >= 1) — the
    md5 twin is the maximal check available exactly while the decode
    is the documented deterministic stand-in.

    Python/DuckDB rounding parity note: mean_intensity = s/2040 with
    integer s, and 20·s ≡ 51 (mod 102) has no solution, so the value
    never lands on an exact 6-dp tie — banker's (Python) and
    half-away (DuckDB) rounding agree on every reachable input."""
    return mm_decode_stub(spark, sf_dir)


# ------------------------------------------------------ mm_frame_sample

@REG.op(
    "mm_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text, length(text) AS n,
             unnest(generate_series(0, {N_FRAMES - 1})) AS frame_idx
      FROM documents
    )
    SELECT doc_id, frame_idx,
           1 + frame_idx * (n // {N_FRAMES}) AS at_offset,
           ascii(substr(text, CAST(1 + frame_idx * (n // {N_FRAMES}) AS INT), 1))
             AS sample_value
    FROM f
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling: take N_FRAMES evenly-strided
    samples from each payload (byte value at offset) — the video
    frame-subsampling access pattern, expressed as explode(sequence)
    + offset arithmetic so it stays JVM-side."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("n")
    )
    stride = F.floor(F.col("n") / N_FRAMES)
    exploded = d.select(
        "doc_id",
        "text",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(N_FRAMES - 1))).alias("frame_idx"),
    )
    offset = (1 + F.col("frame_idx") * stride).cast("int")
    return exploded.select(
        "doc_id",
        "frame_idx",
        offset.cast("bigint").alias("at_offset"),
        F.ascii(F.col("text").substr(offset, F.lit(1))).alias("sample_value"),
    )


# ------------------------------------------------- mm_assembly_profile

@REG.op(
    "mm_assembly_profile",
    oracle="""
    SELECT d.lang, e.label, count(*) AS n_docs,
           round(avg(d.n_chars), 4) AS avg_chars,
           round(avg(sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(e.embedding[i] AS DOUBLE)
                      * CAST(e.embedding[i] AS DOUBLE))))), 4) AS avg_norm
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY 1, 2
    """,
)
def mm_assembly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal dataset assembly: join text metadata with the
    embedding sidecar 1:1 on id, profile per (lang, label) cell —
    the coverage matrix a curriculum/mixture designer reads. One key
    join + one hash aggregate."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    e = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label", norm.alias("norm")
    )
    return (
        d.join(e, "doc_id")
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )


# ---------------------------------------------------- mm_bytes_histogram

@REG.op(
    "mm_bytes_histogram",
    oracle="""
    WITH b AS (
      SELECT source, octet_length(encode(text)) AS n_bytes FROM documents
    ),
    bounds AS (SELECT min(n_bytes) AS lo, max(n_bytes) + 1 AS hi FROM b)
    SELECT source,
           CAST(least(9, floor((n_bytes - lo) * 10.0 / (hi - lo))) AS BIGINT)
             AS bucket,
           count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes
    FROM b, bounds
    GROUP BY 1, 2
    """,
)
def mm_bytes_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-size histogram per source: 10 equal-width byte-length
    buckets (bounds from a broadcast 1-row min/max aggregate) — the
    skew diagnostic run before choosing file split sizes for a
    binary-heavy table."""
    b = load(spark, sf_dir, "documents").select(
        "source", F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes")
    )
    bounds = b.agg(
        F.min("n_bytes").alias("lo"), (F.max("n_bytes") + 1).alias("hi")
    )
    bucket = F.least(
        F.lit(9),
        F.floor((F.col("n_bytes") - F.col("lo")) * 10.0 / (F.col("hi") - F.col("lo"))),
    )
    return (
        b.crossJoin(F.broadcast(bounds))
        .groupBy("source", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_bytes").alias("total_bytes"))
    )


# ------------------------------------------------------ mm_phash_groups

# 16 histogram classes for the perceptual signature — the most common
# English letters; over real media the classes are luma-histogram bins
# from the decoded payload (same bit rule, different feature source)
_PHASH_CLASSES = "etaoinsrhldcumfp"


def _phash_terms_sql() -> tuple[str, str]:
    """(count expressions CTE body, signature expression) for DuckDB."""
    cnts = ", ".join(
        f"length(text) - length(replace(text, '{ch}', '')) AS c{i}"
        for i, ch in enumerate(_PHASH_CLASSES)
    )
    total = " + ".join(f"c{i}" for i in range(len(_PHASH_CLASSES)))
    sig = " + ".join(
        f"(CASE WHEN c{i} * 16 > ({total}) THEN {1 << i} ELSE 0 END)"
        for i in range(len(_PHASH_CLASSES))
    )
    return cnts, sig


_PHASH_CNTS_SQL, _PHASH_SIG_SQL = _phash_terms_sql()


@REG.op(
    "mm_phash_groups",
    oracle=f"""
    WITH cnt AS (
      SELECT doc_id, {_PHASH_CNTS_SQL} FROM documents
    ),
    sig AS (
      SELECT doc_id, CAST({_PHASH_SIG_SQL} AS INT) AS sig FROM cnt
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, sig,
           CAST(count(*) OVER (PARTITION BY sig) AS BIGINT) AS n_same_sig,
           CAST(min(doc_id) OVER (PARTITION BY sig) AS BIGINT)
             AS canonical_id,
           doc_id = min(doc_id) OVER (PARTITION BY sig) AS is_canonical
    FROM sig
    """,
)
def mm_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash grouping over opaque payloads: a 16-bit
    signature where bit i says histogram class i is over-represented
    (count·16 > total — i.e. above the uniform share), then exact-sig
    grouping with a canonical (min-id) representative per group. This
    is the image-dedup shape (pHash → bucket → keep one) with the
    decode stubbed: over real media the class counts come from the
    decoded luma histogram via the `mm_decode_stub` mapInPandas stage;
    here they come from the blob's character histogram, computed as
    pure JVM column math (`length - length(replace(...))` per class —
    no explode, no UDF). Scale: per-row projection + ONE window
    shuffle on the 16-bit signature (at most 65,536 groups,
    perfectly partitionable); group size and canonical id come from
    the same window pass, and per-doc keep decisions stay linear —
    never a pairwise plan."""
    # r14: the 16 per-class character scans are compute-heavy per row
    # and the one-row-group layout serializes them onto a single task —
    # spread_scan (no-op on a real multi-split corpus) parallelizes the
    # projection; sig values and the window result are partition-
    # independent
    d = spread_scan(load(spark, sf_dir, "documents").select("doc_id", "text"))
    cnts = [
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(ch)))
        ).alias(f"c{i}")
        for i, ch in enumerate(_PHASH_CLASSES)
    ]
    cnt = d.select("doc_id", *cnts)
    total = sum(F.col(f"c{i}") for i in range(len(_PHASH_CLASSES)))
    sig = sum(
        F.when(F.col(f"c{i}") * 16 > total, F.lit(1 << i)).otherwise(0)
        for i in range(len(_PHASH_CLASSES))
    )
    sigd = cnt.select("doc_id", sig.cast("int").alias("sig"))
    from pyspark.sql import Window as W

    w = W.partitionBy("sig")
    return sigd.select(
        "doc_id",
        "sig",
        F.count(F.lit(1)).over(w).alias("n_same_sig"),
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )
