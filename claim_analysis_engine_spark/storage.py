"""Storage layer (reference core/storage.py re-expressed Spark-first):
partitioned parquet hub with merge-upsert, partition-pruned reads,
the nested series mart, JSON/Excel sinks, and guarded store cleanup.

Key scalability inversion vs the reference: the reference rewrites the
ENTIRE hub on every upload (core/storage.py:94-130 full-load → concat
→ rewrite — its documented cliff). Here the merge-upsert unions only
against the hub partitions the new batch touches, and the write pins
dynamic partition overwrite at the write site so untouched
(year, month) directories are never rewritten — on ANY session. The series mart is one aggregation
job writing docs distributed — never a driver-side per-group loop.
"""

from __future__ import annotations

import shutil
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from claim_analysis_engine_spark.config import PARTITION_COLS

HUB_PARTITIONS = list(PARTITION_COLS)

_OVERWRITE_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


@contextmanager
def _dynamic_partition_overwrite(spark: SparkSession):
    """Pin partitionOverwriteMode=dynamic for the enclosed write,
    restoring the caller's value afterwards. The hub merge-upsert's
    keep-untouched-partitions semantics DEPEND on dynamic mode; under
    Spark's default (static) the same write truncates the entire hub
    root — silent data loss on any externally built SparkSession. Ops
    must never assume ambient session conf (the tables._load_events
    lesson), so the mode is asserted at the write site itself."""
    prev = spark.conf.get(_OVERWRITE_MODE_KEY, "static")
    if prev.lower() == "dynamic":
        yield
        return
    spark.conf.set(_OVERWRITE_MODE_KEY, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(_OVERWRITE_MODE_KEY, prev)


# ------------------------------------------------------------------ hub

def write_hub(df: DataFrame, hub_path: str) -> None:
    """Partitioned hub write → <hub>/reception_year=YYYY/reception_month=MM/
    (reference ds.write_dataset with DirectoryPartitioning,
    core/storage.py:47-69). Dynamic partition overwrite is pinned at
    the write site, so only partitions present in ``df`` are replaced
    regardless of how the caller's session was configured."""
    with _dynamic_partition_overwrite(df.sparkSession):
        df.write.partitionBy(*HUB_PARTITIONS).mode("overwrite").parquet(hub_path)


def read_hub(
    spark: SparkSession,
    hub_path: str,
    year: int | None = None,
    month: int | None = None,
) -> DataFrame:
    """Hub read with optional partition pruning (reference filtered
    dataset scan, core/storage.py:171-193) — filters on the partition
    columns prune directories before any file is opened."""
    df = spark.read.parquet(hub_path)
    if year is not None:
        df = df.where(F.col("reception_year") == year)
    if month is not None:
        df = df.where(F.col("reception_month") == month)
    return df


def merge_upsert(
    spark: SparkSession, hub_path: str, new_batch: DataFrame, load_seq: str = "load_seq"
) -> None:
    """Hub merge-upsert with keep-last semantics (reference
    core/storage.py:94-130): union the new batch against ONLY the hub
    partitions it touches, window-dedup per claim_id ordered by
    ``load_seq`` (new batch must carry a higher seq than stored rows),
    rewrite just those partitions via dynamic overwrite."""
    if Path(hub_path).exists():
        touched = F.broadcast(new_batch.select(*HUB_PARTITIONS).distinct())
        # left-semi on the partition keys: dynamic partition pruning
        # restricts the hub scan to touched directories — no collect
        existing = spark.read.parquet(hub_path).join(
            touched, HUB_PARTITIONS, "left_semi"
        )
        merged = existing.unionByName(new_batch, allowMissingColumns=True)
    else:
        merged = new_batch
    w = W.partitionBy("claim_id").orderBy(F.col(load_seq).desc())
    deduped = (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # re-cluster on the partition keys before the partitioned write:
    # straight from the claim_id window shuffle, EVERY task holds rows
    # of EVERY (year, month) and the sink writes tasks×dirs files (the
    # small-file explosion snk_compaction exists to clean up). One
    # extra exchange makes each directory the product of exactly one
    # task — bounded files per dir and parallel directory writes. (AQE
    # may coalesce the exchange when volumes are small; coalesced
    # buckets keep whole (year, month) groups together, so the
    # one-file-per-dir property survives.)
    with _dynamic_partition_overwrite(spark):
        deduped.repartition(*HUB_PARTITIONS).write.partitionBy(
            *HUB_PARTITIONS
        ).mode("overwrite").parquet(hub_path)


def available_periods(spark: SparkSession, hub_path: str) -> DataFrame:
    """(year, month, n_rows) inventory (reference get_available_periods
    + footer counts, core/storage.py:218-262) — a metadata-only
    aggregate over partition columns."""
    return (
        spark.read.parquet(hub_path)
        .groupBy(*HUB_PARTITIONS)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(*HUB_PARTITIONS)
    )


# ---------------------------------------------------------- series mart

def sanitize_filename(col: F.Column) -> F.Column:
    """Reference _sanitize_filename (core/storage.py:465-469)."""
    return F.regexp_replace(col, r'[\\/:\*\?"<>\|]', "-")


def build_series_mart(
    claims: DataFrame,
    as_of: str,
    plant_col: str = "plant",
    cat2_col: str = "product_category2",
    major_col: str = "major_category",
    middle_col: str = "middle_category",
    date_col: str = "reception_date",
    spine_bounds: tuple[str, str] | None = None,
) -> DataFrame:
    """Nested monthly series documents, one row per (plant, cat2,
    major) — the reference's generate_nested_series
    (core/storage.py:504-653) as ONE distributed aggregation:

    * month spine = global min..max month of the dataset (zero-fill
      substrate, core/storage.py:472-483) via a broadcast 1-row agg;
    * history counts ALL rows; stats (mean, ddof-1 std, last-3-month
      regr_slope) count only Lag_Valid rows (core/storage.py:557-573);
    * avg_lag_days = mean of valid lag days rounded to 1dp;
    * children = same series per middle category, nested as an array;
    * `last_updated` is the injected ``as_of`` (never datetime.now()).

    Stats are rounded to 6dp at build time so doc round-trips are
    value-stable. Output schema: key, meta{...}, data{history[],
    forecast[]}, children[] — exactly the reference JSON shape.
    """
    base = claims.select(
        F.col(plant_col).alias("plant"),
        F.col(cat2_col).alias("cat2"),
        F.col(major_col).alias("major"),
        F.col(middle_col).alias("middle"),
        F.date_format(F.col(date_col), "yyyy-MM").alias("month"),
        F.col("lag_days"),
        F.col("lag_valid"),
    ).where(F.col("month").isNotNull())

    if spine_bounds is None:
        bounds = base.agg(
            F.min(F.to_date(F.concat(F.col("month"), F.lit("-01")))).alias("lo"),
            F.max(F.to_date(F.concat(F.col("month"), F.lit("-01")))).alias("hi"),
        )
    else:
        # injected bounds ("yyyy-MM" strings): the incremental refresh
        # passes the FULL hub's range so a partial rebuild zero-fills
        # the same spine as a full rebuild would
        lo, hi = spine_bounds
        bounds = claims.sparkSession.range(1).select(
            F.to_date(F.lit(f"{lo}-01")).alias("lo"),
            F.to_date(F.lit(f"{hi}-01")).alias("hi"),
        )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("m")
    ).select(F.date_format("m", "yyyy-MM").alias("month"))

    def zero_filled(keys: list[str]) -> DataFrame:
        counts = base.groupBy(*keys, "month").agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count(F.when(F.col("lag_valid"), 1)).alias("n_valid"),
        )
        grid = base.select(*keys).distinct().crossJoin(F.broadcast(spine))
        return grid.join(counts, [*keys, "month"], "left").select(
            *keys,
            "month",
            F.coalesce("n_all", F.lit(0)).alias("n_all"),
            F.coalesce("n_valid", F.lit(0)).alias("n_valid"),
        )

    def series_agg(zf: DataFrame, keys: list[str]) -> DataFrame:
        w = W.partitionBy(*keys).orderBy("month")
        wcnt = W.partitionBy(*keys)
        zf = zf.withColumn("idx", F.row_number().over(w)).withColumn(
            "n_months", F.count(F.lit(1)).over(wcnt)
        )
        last3 = F.col("idx") > F.col("n_months") - 3
        return zf.groupBy(*keys).agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("month").alias("date"), F.col("n_all").alias("count")))
            ).alias("history"),
            F.round(F.avg("n_valid"), 6).alias("mean"),
            F.round(F.coalesce(F.stddev_samp("n_valid"), F.lit(0.0)), 6).alias("std"),
            F.round(
                F.coalesce(
                    F.regr_slope(
                        F.when(last3, F.col("n_valid")).cast("double"),
                        F.when(last3, F.col("idx")).cast("double"),
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("slope"),
        )

    def lag_agg(keys: list[str]) -> DataFrame:
        return base.groupBy(*keys).agg(
            F.round(
                F.coalesce(F.avg(F.when(F.col("lag_valid"), F.col("lag_days"))), F.lit(0.0)),
                1,
            ).alias("avg_lag_days")
        )

    pkeys = ["plant", "cat2", "major"]
    parent = series_agg(zero_filled(pkeys), pkeys).join(lag_agg(pkeys), pkeys)

    ckeys = [*pkeys, "middle"]
    child = (
        series_agg(zero_filled(ckeys), ckeys)
        .join(lag_agg(ckeys), ckeys)
        .groupBy(*pkeys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.coalesce(F.col("middle"), F.lit("")).alias("sub_key"),
                        F.struct("mean", "std", "slope", "avg_lag_days").alias("stats"),
                        F.col("history").alias("history"),
                    )
                )
            ).alias("children")
        )
    )

    return parent.join(child, pkeys).select(
        F.concat_ws("_", "plant", "cat2", "major").alias("key"),
        F.struct(
            F.lit(as_of).alias("last_updated"),
            F.lit(0).alias("warning_level"),
            F.lit(None).cast("string").alias("champion_model"),
            F.struct("mean", "std", "slope", "avg_lag_days").alias("parent_stats"),
        ).alias("meta"),
        F.struct(
            F.col("history"),
            F.array().cast("array<struct<date:string,count:long>>").alias("forecast"),
        ).alias("data"),
        F.col("children"),
    )


def refresh_series_incremental(
    claims: DataFrame, batch: DataFrame, as_of: str, **mart_kwargs
) -> DataFrame:
    """Incremental series-mart refresh (the reference's designed-but-
    unimplemented P6 item, docs/project_master.md:24): rebuild ONLY the
    (plant, cat2, major) groups the new batch touches, instead of all
    4,774 documents on every upload.

    ``claims`` is the full post-merge hub frame; ``batch`` the newly
    ingested rows. The touched-group set broadcasts into a left-semi
    join, so the mart aggregation reads only affected groups' rows —
    at 100 TB an upload touching 3 plants recomputes 3 plants.

    Spine safety (two hazards, both handled here):
    * the zero-fill spine always uses the FULL hub's month range
      (injected via spine_bounds), so a partial rebuild produces
      identical documents to a full rebuild for the touched groups
      even when those groups don't span the hub range themselves;
    * when the upload EXTENDS the global month range the zero-fill
      substrate of every untouched document changes too, so the
      function detects it and falls back to the full build by itself.
      The detection is exact: a hub boundary month is new iff it
      consists solely of batch rows, checked from two per-month count
      aggregates (map-side combine; |months| rows each — a refresh
      decision, not a per-row loop).
    """
    plant = mart_kwargs.get("plant_col", "plant")
    cat2 = mart_kwargs.get("cat2_col", "product_category2")
    major = mart_kwargs.get("major_col", "major_category")
    date_col = mart_kwargs.get("date_col", "reception_date")

    month = F.date_format(F.col(date_col), "yyyy-MM").alias("m")
    hub_m = claims.groupBy(month).agg(F.count(F.lit(1)).alias("nc"))
    batch_m = batch.groupBy(month).agg(F.count(F.lit(1)).alias("nb"))
    hub = hub_m.agg(F.min("m").alias("lo"), F.max("m").alias("hi")).first()
    pre = (
        hub_m.join(batch_m, "m", "left")
        .where(F.col("nc") > F.coalesce(F.col("nb"), F.lit(0)))
        .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
        .first()
    )
    if pre.lo is None or pre.lo != hub.lo or pre.hi != hub.hi:
        # a boundary month exists only because of this batch: the spine
        # grew, every document's history array changes — full rebuild
        return build_series_mart(claims, as_of, **mart_kwargs)

    touched = batch.select(plant, cat2, major).distinct()
    affected = claims.join(F.broadcast(touched), [plant, cat2, major], "left_semi")
    return build_series_mart(
        affected, as_of, spine_bounds=(hub.lo, hub.hi), **mart_kwargs
    )


def write_series_docs(docs: DataFrame, out_dir: str) -> None:
    """Series-mart sink: one JSON document per line, written
    distributed (reference writes 4,774 files in a driver loop,
    core/storage.py:642-650 — a scale anti-pattern replaced here by a
    parallel JSON write)."""
    docs.write.mode("overwrite").json(out_dir)


# ------------------------------------------------------------- cleanup

def util_clear(path: str, *, confirm: bool = False) -> bool:
    """Guarded recursive store delete (reference clear_all_data,
    core/storage.py:274-293): refuses without confirm=True, refuses
    obviously-wrong targets (root/short paths)."""
    p = Path(path).resolve()
    if not confirm:
        return False
    if len(p.parts) < 3:
        raise ValueError(f"refusing to delete suspicious path {p}")
    if p.exists():
        shutil.rmtree(p)
        return True
    return False


# ------------------------------------------------------------- excel

# Minimal dependency-free xlsx support: an .xlsx file is a zip of XML
# parts; a single sheet with inline strings needs four fixed parts plus
# the sheet. Enough for the reference's ingestion (core/etl.py:39-40)
# and download-card export (app.py:509-516) surfaces — both small,
# driver-side datasets. When openpyxl/pandas-excel IS available the
# same functions prefer it (richer type handling).

_XLSX_STATIC = {
    "[Content_Types].xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    ),
    "_rels/.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    ),
    "xl/workbook.xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    ),
    "xl/_rels/workbook.xml.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    ),
}


def xlsx_write_rows(path: str, header: list[str], rows: list[tuple]) -> None:
    """Write a single-sheet .xlsx with inline strings (stdlib only)."""
    import xml.sax.saxutils as sx
    import zipfile

    def row_xml(cells) -> str:
        return (
            "<row>"
            + "".join(
                f'<c t="inlineStr"><is><t>{sx.escape("" if v is None else str(v))}</t></is></c>'
                for v in cells
            )
            + "</row>"
        )

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        + row_xml(header)
        + "".join(row_xml(r) for r in rows)
        + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, content in _XLSX_STATIC.items():
            z.writestr(name, content)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def xlsx_read_rows(path: str) -> tuple[list[str], list[tuple]]:
    """Read the first sheet of an .xlsx (inline or shared strings)."""
    import xml.etree.ElementTree as ET
    import zipfile

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{ns}t")) for si in root]
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        out: list[tuple] = []
        for row in sheet.iter(f"{ns}row"):
            cells = []
            for c in row.iter(f"{ns}c"):
                if c.get("t") == "inlineStr":
                    cells.append("".join(t.text or "" for t in c.iter(f"{ns}t")))
                elif c.get("t") == "s":
                    v = c.find(f"{ns}v")
                    cells.append(shared[int(v.text)] if v is not None else "")
                else:
                    v = c.find(f"{ns}v")
                    cells.append(v.text if v is not None else None)
            out.append(tuple(cells))
    header = [str(h) for h in out[0]] if out else []
    return header, out[1:]


def read_excel(spark: SparkSession, path: str, sheet_name: int | str = 0) -> DataFrame:
    """Excel source (reference pd.read_excel, core/etl.py:39-40):
    pandas/openpyxl bridge when available, else the built-in minimal
    xlsx reader. All columns land as strings — the canonical layer
    types them (same contract as CSV)."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name, dtype=str)
        return spark.createDataFrame(pdf)
    except ImportError:
        header, rows = xlsx_read_rows(path)
        return spark.createDataFrame(rows, schema=", ".join(f"`{h}` string" for h in header))


def write_excel(df: DataFrame, path: str) -> None:
    """Excel export (reference app.py:509-516 download cards):
    driver-side, small result sets only — the reference exports
    filtered alert cards, never raw facts."""
    # bounded: panel-sized export frames only (see docstring)
    rows = [tuple(r) for r in df.collect()]
    xlsx_write_rows(path, list(df.columns), rows)
