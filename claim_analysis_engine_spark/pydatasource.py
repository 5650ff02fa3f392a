"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
distributed synthetic-corpus generation as a first-class SOURCE.

Why a datasource and not createDataFrame: generating training-shaped
synthetic data is itself a pipeline primitive at 100 TB — a fixture
the driver materializes is bounded by one machine, while a DataSource
reader generates PER PARTITION on the executors (each partition owns a
doc-id range; every doc is seeded by its own id, so the corpus is
byte-identical under ANY partition count — repartitioning the
generation never changes the data, the property that makes the source
usable as a reproducible benchmark feed). This is also the engine's
newest extension surface: the reader plans as a regular v2 scan
(supports column pruning via the schema argument), not a Python UDF in
a map stage.

No reference counterpart (the reference reads static files only);
registered as src_pydatasource_corpus in operators/storage_ops.py with
a golden-pinned stats row (tests/test_storage.py)."""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYNTH_VOCAB = 20000     # distinct words (shared with the Zipf fixture)
SYNTH_ZIPF_A = 1.3      # Zipf exponent
SYNTH_DEFAULT_DOCS = 2000
SYNTH_DEFAULT_PARTS = 8


def synth_vocab() -> list[str]:
    """The frozen 20k-word vocabulary (numpy RandomState(7), identical
    to operators.dedup_text._zipf_corpus's) — regenerated cheaply
    wherever needed instead of shipped, so the reader has no
    broadcast dependency."""
    import numpy as np

    rng = np.random.RandomState(7)
    lengths = rng.randint(5, 11, size=SYNTH_VOCAB)
    letters = "abcdefghijklmnopqrstuvwxyz"
    return [
        "".join(letters[c] for c in rng.randint(0, 26, size=n))
        for n in lengths
    ]


def synth_doc(doc_id: int, vocab: list[str]) -> str:
    """One document, seeded by ITS OWN id — partition-layout-free
    determinism (the invariance test reads the source at two partition
    counts and asserts identical stats)."""
    import numpy as np

    rng = np.random.RandomState(1_000_003 + doc_id)
    n_words = int(rng.randint(60, 161))
    ranks = (rng.zipf(SYNTH_ZIPF_A, size=n_words) - 1) % SYNTH_VOCAB
    return " ".join(vocab[r] for r in ranks)


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class ZipfCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", SYNTH_DEFAULT_DOCS))
        self.n_parts = int(options.get("n_parts", SYNTH_DEFAULT_PARTS))

    def partitions(self):
        step = -(-self.n_docs // self.n_parts)
        return [
            _RangePartition(i * step, min(self.n_docs, (i + 1) * step))
            for i in range(self.n_parts)
            if i * step < self.n_docs
        ]

    def read(self, partition: _RangePartition):
        vocab = synth_vocab()
        for doc_id in range(partition.lo, partition.hi):
            yield (doc_id, synth_doc(doc_id, vocab))


class ZipfCorpusDataSource(DataSource):
    """spark.read.format("zipfcorpus").option("n_docs", N)
    .option("n_parts", P).load() → (doc_id long, text string)."""

    @classmethod
    def name(cls) -> str:
        return "zipfcorpus"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> ZipfCorpusReader:
        return ZipfCorpusReader(self.options)


def register_zipfcorpus(spark) -> None:
    """Idempotent per-session registration (re-registering the same
    class under the same name is a harmless overwrite)."""
    spark.dataSource.register(ZipfCorpusDataSource)


# ------------------------------------------- streaming source (events)

EVENTS_REPLAY_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    """Replay an events parquet file as a micro-batch STREAM in
    timestamp order — the Spark 4 Python DataSource streaming API
    (pyspark.sql.datasource.simpleStreamReader), the engine's 9th
    streaming surface. Offsets are row indexes into the ts-sorted
    table: read(start) hands the next `batch_rows` rows to the engine
    and advances the offset, so one staged file becomes a SEQUENCE of
    real micro-batches with the watermark advancing between them.
    Timestamp order makes the replay late-data-free by construction
    (each new batch's min ts exceeds every prior watermark), which is
    what lets a batch oracle reproduce the finalized-sink contents
    exactly.

    The simple reader runs on the DRIVER (the documented low-
    throughput half of the API — the partition-planning
    DataSourceStreamReader is the executor-parallel form); right-sized
    here, where the stream's job is to certify source semantics:
    exactly-once offset progression, type fidelity through the Arrow
    boundary, and replayability (readBetweenOffsets serves recovery
    re-reads from the checkpoint)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_rows = int(options.get("batch_rows", 2500))
        self._table = None

    def _sorted_table(self):
        if self._table is None:
            import pyarrow.parquet as pq

            t = pq.read_table(
                self.path,
                columns=["event_id", "ts", "user_id", "event_type", "value"],
            )
            self._table = t.sort_by("ts")
        return self._table

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, lo: int, hi: int):
        t = self._sorted_table().slice(lo, hi - lo)
        cols = [t.column(name).to_pylist() for name in t.column_names]
        return iter(list(zip(*cols)))

    def read(self, start: dict):
        n = self._sorted_table().num_rows
        i = start["i"]
        if i >= n:
            if start.get("eof"):
                return iter([]), start  # fully drained: no progress
            # serve ONE empty sentinel batch past the data: the last
            # data batch's watermark update finalizes its windows, but
            # append mode EMITS them in the NEXT batch — which the
            # engine only runs when the offset progresses. Without
            # this, a queue-shaped source leaves the tail windows
            # stranded in state forever (the file sources get the same
            # service from availableNow's final commit).
            return iter([]), {"i": n, "eof": 1}
        j = min(n, i + self.batch_rows)
        return self._rows(i, j), {"i": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["i"], min(end["i"], self._sorted_table().num_rows))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: the staged file is the retention


class EventsReplayDataSource(DataSource):
    """spark.readStream.format("eventsreplay").option("path", f)
    .option("batch_rows", N).load() → the events schema, replayed in
    ts order, N rows per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "eventsreplay"

    def schema(self) -> str:
        return EVENTS_REPLAY_SCHEMA

    def simpleStreamReader(self, schema) -> EventsReplayStreamReader:
        return EventsReplayStreamReader(self.options)


def register_eventsreplay(spark) -> None:
    spark.dataSource.register(EventsReplayDataSource)


# --------------------------------------- batch SINK (JSONL shards)

# The WRITE half of the Spark 4 Python DataSource API (the engine
# already ships the batch reader and the streaming reader): a custom
# sink whose per-task `write` runs ON THE EXECUTORS, returns a commit
# message per partition, and whose driver-side `commit` publishes a
# manifest only after every task succeeded — the two-phase commit
# protocol a real external sink (feature store, search index, vendor
# API) needs, demonstrated end-to-end with files so the result is
# value-certifiable. `abort` removes the partial shards, so a failed
# job leaves no torn output visible to readers (the manifest IS the
# visibility gate).

_MANIFEST = "_MANIFEST.json"


class _ShardCommit(WriterCommitMessage):
    def __init__(self, shard: str, n_rows: int):
        self.shard = shard
        self.n_rows = n_rows


class JsonlShardWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.path = options["path"]
        self.overwrite = overwrite
        # job-unique token baked into every shard name (r12 advice):
        # without it, a second save() into the same path with FEWER
        # partitions would overwrite some shards and leave the rest
        # stale — orphaned bytes that a manifest-ignoring reader could
        # see. Minted once on the driver, pickled to every task, so
        # one job's shards share it and no two jobs ever collide; the
        # manifest remains the visibility gate either way.
        # Overwrite-mode cleanup happens in commit(), NOT here (r13
        # advice): deleting prior shards before any task runs opened a
        # data-loss window — a failed overwrite job left the directory
        # with neither old nor new output. The new job writes its
        # token-named shards ALONGSIDE the old ones; only after every
        # task succeeded does commit() publish the new manifest and
        # sweep foreign-token shards, so a failure at any point leaves
        # the prior manifest and its shards fully intact.
        self.job_token = uuid.uuid4().hex[:12]

    def write(self, iterator):
        import json as _json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        shard = os.path.join(
            self.path,
            f"shard-{self.job_token}-{ctx.partitionId():05d}.jsonl",
        )
        n = 0
        with open(shard, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _ShardCommit(shard, n)

    def commit(self, messages) -> None:
        import glob as _glob
        import json as _json
        import os

        manifest = {
            "shards": sorted(
                (
                    {"shard": os.path.basename(m.shard), "n_rows": m.n_rows}
                    for m in messages
                    if m is not None
                ),
                key=lambda s: s["shard"],
            ),
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, _MANIFEST), "w") as fh:
            _json.dump(manifest, fh, sort_keys=True)
        # Deferred overwrite cleanup (r13 advice): the new manifest is
        # already on disk and lists only this job's shards, so a crash
        # during the sweep can orphan bytes (glob readers see them) but
        # can never break a manifest-gated reader. 'append' keeps prior
        # shards — the manifest describes the LATEST job only
        # (documented behavior).
        if self.overwrite:
            keep = f"shard-{self.job_token}-"
            for f in _glob.glob(os.path.join(self.path, "shard-*.jsonl")):
                if not os.path.basename(f).startswith(keep):
                    os.remove(f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.shard):
                os.remove(m.shard)


class JsonlShardsDataSource(DataSource):
    """df.write.format("jsonlshards").option("path", dir).save() —
    one JSONL shard per partition + a driver-committed manifest."""

    @classmethod
    def name(cls) -> str:
        return "jsonlshards"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        return JsonlShardWriter(self.options, overwrite)


def register_jsonlshards(spark) -> None:
    spark.dataSource.register(JsonlShardsDataSource)
