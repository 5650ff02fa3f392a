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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
