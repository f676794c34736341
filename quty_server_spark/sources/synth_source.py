"""Custom PySpark DataSource (Spark 4 Python data source API): the
engine's extension point for connectors Spark has no builtin for —
internal feeds, bespoke formats, service APIs. The reference's only
"source" is a WebSocket ingress (SURVEY §2.B); this is the idiomatic
Spark counterpart: a declarative, partition-parallel, filter-pushdown
source the planner treats like any other scan.

The registered instance generates a deterministic synthetic corpus
(integer-hash token selection, zero I/O) so the DuckDB oracle can
reproduce every row from the same arithmetic — the read PATH is what is
under test, not the data:

- **partition-parallel**: the doc_id range splits into ``n_shards``
  contiguous ``InputPartition``\\s; executors generate their slice
  independently (at scale: one partition per feed shard / file split).
- **filter pushdown** (`pushFilters`, Spark 4.1): range predicates on
  ``doc_id`` narrow the generated range BEFORE partitioning, so a
  ``WHERE doc_id < k`` query materializes only the matching slice —
  whole partitions are never created, the Python-source analog of
  parquet row-group pruning. Consumed filters are fully applied by the
  reader; everything else is left for Spark to evaluate post-scan.

Determinism contract (mirrored in the oracle SQL, integer-exact):
``n_tokens(i) = i % 13 + 3``; token j of doc i is
``'w' + zero-pad2((i * 2654435761 + j * 40503) % 2^20 % 32)``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    DataSourceWriter,
    WriterCommitMessage,
)

_MULT = 2654435761  # Knuth multiplicative hash (shared with similarity.py)
_MOD = 1048576
_VOCAB = 32


def synth_text(doc_id: int) -> str:
    """The deterministic document body — importable so tests and the
    oracle-generating code share one definition with the reader."""
    n = doc_id % 13 + 3
    return " ".join(
        f"w{(doc_id * _MULT + j * 40503) % _MOD % _VOCAB:02d}" for j in range(n)
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.lo = 0
        self.hi = int(options.get("n_docs", 2000))
        self.n_shards = int(options.get("n_shards", 8))

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("doc_id",) and isinstance(
                f,
                (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual),
            ):
                v = int(f.value)
                # Narrow [lo, hi) exactly; a consumed filter is fully
                # applied by construction, so it is NOT yielded back.
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:  # LessThanOrEqual
                    self.hi = min(self.hi, v + 1)
            else:
                yield f  # unsupported — Spark evaluates it post-scan

    def partitions(self):
        # Contiguous slices of the (already filter-narrowed) range: a
        # pushed range predicate prunes whole partitions before any row
        # is generated. Never return [] — PySpark substitutes [None]
        # for an empty partition list and calls read(None), so a filter
        # that empties the range must yield ONE empty partition.
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        per = max(1, -(-(hi - lo) // self.n_shards))
        return [
            _RangePartition(s, min(s + per, hi))
            for s in range(lo, hi, per)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, i % self.n_shards, synth_text(i))


class SynthCorpusDataSource(DataSource):
    """format name: ``quty_synth``; options: n_docs (default 2000),
    n_shards (default 8)."""

    @classmethod
    def name(cls) -> str:
        return "quty_synth"

    def schema(self) -> str:
        return "doc_id bigint, shard int, text string"

    def reader(self, schema) -> SynthCorpusReader:
        return SynthCorpusReader(self.options)


def _register(spark, cls) -> None:
    """Idempotent registration: re-registering the same name is
    latest-wins on current builds, but older ones raise a
    DATA_SOURCE_ALREADY_EXISTS error — swallow ONLY that; any other
    failure (API mismatch, bad class) must propagate instead of
    resurfacing later as an opaque 'format not found'."""
    try:
        spark.dataSource.register(cls)
    except Exception as exc:  # noqa: BLE001 — filtered by message below
        if "ALREADY_EXISTS" not in str(exc).upper():
            raise


def register_synth_source(spark) -> None:
    _register(spark, SynthCorpusDataSource)


class SynthCorpusStreamReader(SimpleDataSourceStreamReader):
    """``SimpleDataSourceStreamReader`` over the same deterministic
    corpus: each micro-batch is the next ``batch_docs`` ids of
    ``[0, n_docs)``; the offset is the next unread id. Replay contract:
    ``readBetweenOffsets`` regenerates any [start, end) slice
    bit-identically (the generator is pure), so a batch planned before a
    crash re-materializes exactly on restart — the source half of
    exactly-once."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 500))
        self.batch_docs = int(options.get("batch_docs", 200))
        self.n_shards = int(options.get("n_shards", 8))

    def initialOffset(self):
        return {"next": 0}

    def _rows(self, start: int, end: int):
        # A LIST, not a generator: the prefetching wrapper copy.copy()s
        # the returned iterable when a planned batch is re-served after
        # restart, and generators aren't copyable.
        return [(i, i % self.n_shards, synth_text(i)) for i in range(start, end)]

    def read(self, start):
        s = int(start["next"])
        e = min(s + self.batch_docs, self.n_docs)
        return self._rows(s, e), {"next": e}

    def readBetweenOffsets(self, start, end):
        return self._rows(int(start["next"]), int(end["next"]))

    def commit(self, end):
        pass  # nothing to release: the generator holds no state


class SynthCorpusStreamDataSource(DataSource):
    """format name: ``quty_synth_stream``; options: n_docs (default
    500), batch_docs (default 200), n_shards (default 8 — modulus for
    the emitted ``shard`` column, same contract as the batch source)."""

    @classmethod
    def name(cls) -> str:
        return "quty_synth_stream"

    def schema(self) -> str:
        return "doc_id bigint, shard int, text string"

    def simpleStreamReader(self, schema) -> SynthCorpusStreamReader:
        return SynthCorpusStreamReader(self.options)


def register_synth_stream_source(spark) -> None:
    _register(spark, SynthCorpusStreamDataSource)


class _PartCommit(WriterCommitMessage):
    """Per-task commit message: the ATTEMPT file it wrote + audit counts.
    Picklable by contract (plain attributes only)."""

    def __init__(self, path: str, n_rows: int, doc_id_sum: int):
        self.path = path
        self.n_rows = n_rows
        self.doc_id_sum = doc_id_sum


class SynthSinkWriter(DataSourceWriter):
    """Transactional custom sink (the writer half of the API): each task
    writes its partition to a UNIQUE attempt file under ``_attempts/``
    (retried/speculative attempts can never collide or append twice),
    and only the driver-side ``commit`` publishes a manifest listing
    exactly the files of the SUCCESSFUL attempts plus their audited row
    count. Readers go through the manifest, so uncommitted attempt
    files are invisible — the same snapshot-isolation device as
    sink_manifest_snapshot, here implemented through Spark's own
    two-phase commit protocol (write → WriterCommitMessage → commit /
    abort) instead of by hand."""

    def __init__(self, options, overwrite: bool):
        self.base = options["path"]
        self.overwrite = overwrite

    def write(self, rows):
        import json as _json
        import os
        import uuid

        att_dir = os.path.join(self.base, "_attempts")
        os.makedirs(att_dir, exist_ok=True)
        path = os.path.join(att_dir, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        s = 0
        with open(path, "w") as fh:
            for row in rows:
                d = row.asDict()
                fh.write(_json.dumps(d, sort_keys=True) + "\n")
                n += 1
                s += int(d.get("doc_id", 0))
        return _PartCommit(path, n, s)

    def commit(self, messages):
        import json as _json
        import os

        manifest = {
            "files": sorted(m.path for m in messages),
            "total_rows": sum(m.n_rows for m in messages),
            "doc_id_sum": sum(m.doc_id_sum for m in messages),
        }
        tmp = os.path.join(self.base, "_manifest.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.base, "manifest.json"))

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class SynthSinkDataSource(DataSource):
    """format name: ``quty_synth_sink``; option: path (output dir)."""

    @classmethod
    def name(cls) -> str:
        return "quty_synth_sink"

    def writer(self, schema, overwrite: bool) -> SynthSinkWriter:
        return SynthSinkWriter(self.options, overwrite)


def register_synth_sink(spark) -> None:
    _register(spark, SynthSinkDataSource)
