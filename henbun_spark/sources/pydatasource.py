"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-documents generator, batch AND streaming.

Why it exists: corpus-pipeline development needs input that (a) scales to
any row count without moving data, (b) is bit-reproducible across runs
and retries, and (c) can replay as a stream with exact offsets for
testing streaming ingest paths. Files can't give (a); `rate` can't give
a documents schema. This source generates rows ON the executors —
each `InputPartition` derives every row from (seed, doc_id) alone, so a
retried task regenerates identical rows (the same determinism contract
the engine's samplers use: hash the key, never carry RNG state).

Batch:
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.read.format("synthetic_docs")
        .option("rows", 100000).option("partitions", 32).load()

Streaming (replayable, exactly-once with checkpointing — offsets are
row counts, every micro-batch is a contiguous deterministic id range):
    spark.readStream.format("synthetic_docs")
        .option("rowsPerBatch", 5000).load()

Schema mirrors the testdata `documents` table:
  doc_id bigint, text string, lang string, source string, n_chars int
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"

_LANGS = ["en", "de", "fr", "es", "ja"]
_SOURCES = ["web", "wiki", "books", "code", "news"]
# tiny word pools per language so language-ID / quality operators see
# plausible token distributions
_WORDS = {
    "en": "the of and to in is was for on that with he as his they at be".split(),
    "de": "der die und in den von zu das mit sich des auf ist im dem".split(),
    "fr": "le de la et les des en un du une que est pour qui dans".split(),
    "es": "de la que el en y a los del se las por un con una su".split(),
    "ja": "no ni wa wo ta ga de te to shi re sa aru iru mo nai".split(),
}


def _h(*parts) -> int:
    """Deterministic 64-bit hash of the parts — the only 'randomness'."""
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def make_doc(doc_id: int, seed: int = 0):
    """One synthetic document row, a pure function of (seed, doc_id)."""
    lang = _LANGS[_h(seed, doc_id, "lang") % len(_LANGS)]
    source = _SOURCES[_h(seed, doc_id, "src") % len(_SOURCES)]
    n_words = 20 + _h(seed, doc_id, "len") % 180
    pool = _WORDS[lang]
    words = [
        pool[_h(seed, doc_id, "w", i) % len(pool)] for i in range(n_words)
    ]
    # ~3% of docs are exact duplicates of an earlier doc (dedup fodder);
    # the duplicated doc keeps its OWN id but copies the earlier text
    if doc_id > 100 and _h(seed, doc_id, "dup") % 33 == 0:
        src = make_doc(doc_id - 1 - _h(seed, doc_id, "dupof") % 100, seed)
        return (doc_id, src[1], src[2], src[3], src[4])
    text = " ".join(words)
    return (doc_id, text, lang, source, len(text))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _DocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        if self.rows <= 0:
            # pyspark replaces an empty partition list with [None] and
            # calls read(None) — hand it one empty range instead
            return [_RangePartition(0, 0, self.seed)]
        per = -(-self.rows // self.n_parts)
        return [
            _RangePartition(i * per, min((i + 1) * per, self.rows), self.seed)
            for i in range(self.n_parts)
            if i * per < self.rows
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            yield make_doc(doc_id, partition.seed)


class _DocsStreamReader(DataSourceStreamReader):
    """Row-count offsets: batch k covers ids [k*rowsPerBatch, (k+1)*...).
    Offsets are plain dicts, checkpoint-serializable; a replayed batch
    regenerates byte-identical rows, so downstream exactly-once state
    (e.g. the foreachBatch maintenance sinks) is testable end-to-end."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 1000))
        self.max_batches = int(options.get("maxBatches", 4))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 0))
        # highest offset reported so far (driver-side poll cursor;
        # re-synced from every planned batch range in partitions(), so a
        # restart resumes from the committed offset after at most one
        # empty catch-up poll rather than rewinding)
        self._reported = 0
        # committed offset revealed by a BACKWARDS planned range after a
        # clean restart: later batches never re-emit ids below it (see
        # partitions())
        self._floor = 0

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        # advance by one batch per poll, up to the cap: a
        # processing-time trigger then really ingests rowsPerBatch ids
        # per micro-batch (the docstring's contract), instead of the
        # whole cap landing in batch 0. NOTE availableNow snapshots
        # latestOffset ONCE, so it drains a single poll step per run —
        # use a processing-time trigger (or poll-restart) to drain the
        # cap incrementally.
        cap = self.rows_per_batch * self.max_batches
        nxt = min(self._reported + self.rows_per_batch, cap)
        self._reported = nxt
        return {"row": nxt}

    def partitions(self, start, end):
        lo, hi = int(start["row"]), int(end["row"])
        # sync the poll cursor with the engine's planned range, so a
        # restart from a checkpoint resumes at the committed offset
        # instead of re-climbing from 0 one poll at a time
        self._reported = max(self._reported, lo, hi)
        # Clean-restart hazard: a fresh reader's first latestOffset()
        # can sit BELOW the checkpoint's committed offset (cursor starts
        # at 0), and MicroBatchExecution only checks offset INEQUALITY —
        # it then plans one BACKWARDS batch (start=committed, end=below)
        # and later catch-up batches overlapping the already-committed
        # range. A backwards range is exactly how that committed offset
        # becomes visible here: record it as a floor, emit nothing for
        # the backwards batch, and clamp later overlapping ranges so
        # committed ids are never re-emitted. Forward ranges never touch
        # the floor, so WAL replay of a pending batch (a normal forward
        # range) still re-emits its full range for the downstream
        # idempotent sinks.
        if hi < lo:
            self._floor = max(self._floor, lo)
        lo = max(lo, self._floor)
        if hi <= lo:
            # empty/backwards window: pyspark replaces an empty
            # partition list with [None] and calls read(None) — hand it
            # one empty range instead
            return [_RangePartition(0, 0, self.seed)]
        per = -(-(hi - lo) // self.n_parts)
        return [
            _RangePartition(lo + i * per, min(lo + (i + 1) * per, hi), self.seed)
            for i in range(self.n_parts)
            if lo + i * per < hi
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            yield make_doc(doc_id, partition.seed)

    def commit(self, end):
        pass

    def stop(self):
        pass


class SyntheticDocsDataSource(DataSource):
    """`synthetic_docs` — deterministic documents generator (batch +
    replayable stream), rows born on the executors."""

    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _DocsReader(self.options)

    def streamReader(self, schema):
        return _DocsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
